"""Column-expression builders and driver-side text tools."""
