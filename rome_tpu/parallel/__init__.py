"""parallel subpackage of rome_tpu."""
