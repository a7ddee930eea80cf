"""Dataset sources (column-pruned parquet readers)."""
