"""Command-line entry points (replacing the reference's run_*.sh layer)."""
