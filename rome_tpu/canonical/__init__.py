"""canonical subpackage of rome_tpu."""
