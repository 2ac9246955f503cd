"""End-to-end pipeline orchestration, materialization, checkpoint/resume."""
