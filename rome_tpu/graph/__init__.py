"""graph subpackage of rome_tpu."""
