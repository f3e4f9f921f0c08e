"""Multi-device scenario sharding (no upstream analogue; SURVEY.md §2.3)."""
