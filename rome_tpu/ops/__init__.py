"""ops subpackage of rome_tpu."""
