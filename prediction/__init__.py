"""Reference-compatible entry points: `python -m prediction.<name>`."""
