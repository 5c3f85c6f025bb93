"""frontend subpackage of rome_tpu."""
