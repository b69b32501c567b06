"""Composable DataFrame -> DataFrame operators (SURVEY.md par.2)."""
