"""Multi-chip scaling over ICI: Gaussian-map sharding (SURVEY.md §2.3)."""
