"""Seed-fixed synthetic fixture generators (FIXTURES.md)."""
