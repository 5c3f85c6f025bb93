"""solvers subpackage of rome_tpu."""
