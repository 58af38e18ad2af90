"""Simulation models: the per-step pipelines of each reference generation."""
