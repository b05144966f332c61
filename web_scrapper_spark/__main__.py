"""``python -m web_scrapper_spark`` → the CLI (SURVEY.md §3)."""

from .cli import cli

cli()
