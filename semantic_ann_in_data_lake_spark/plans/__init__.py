"""Composed end-to-end plans and the driver-facing query registry."""
