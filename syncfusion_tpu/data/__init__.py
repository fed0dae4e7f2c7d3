"""Host-side data pipelines: tar shard streaming, chunk slicing, prefetch."""
