"""Physical-plan introspection utilities (SURVEY.md §4)."""
