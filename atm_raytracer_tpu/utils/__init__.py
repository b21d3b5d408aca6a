"""Small shared utilities (color conversions live in ops.coloring)."""
