"""io subpackage of rome_tpu."""
