"""map_batches stage library: each stage is a vectorized function or a
callable class (actor pool) over Arrow record batches."""
