"""Placeholder query module — populated in later build steps."""
