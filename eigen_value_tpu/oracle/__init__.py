"""Oracle CLI package (reference main.py harness equivalent)."""
