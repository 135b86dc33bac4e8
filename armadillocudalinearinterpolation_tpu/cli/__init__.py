"""CLI layer: the continuation driver application."""
