"""Command-line entry points (`python -m davo_tpu.cli ...`)."""
