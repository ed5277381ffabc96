"""Standalone tools (bench/profile/parity); importable for tests."""
