"""Report/plot generation (reference paperplotly.py, C7)."""
