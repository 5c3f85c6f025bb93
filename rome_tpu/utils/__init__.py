"""utils subpackage of rome_tpu."""
