"""Command-line drivers mirroring the reference binaries."""
