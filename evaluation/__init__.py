"""Reference-compatible entry points: `python -m evaluation.<name>`."""
