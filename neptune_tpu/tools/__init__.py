"""Command-line tooling (the reference's `neptune-opt` surface)."""
