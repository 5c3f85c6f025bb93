"""manifolds subpackage of rome_tpu."""
