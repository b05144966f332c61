"""spark-submit driver: the engine CLI, resolved from the --py-files
zip on every node (executors import the identical artifact for the
Arrow extraction UDFs). Invoked by scripts/submit_crawl.sh."""

from web_scrapper_spark.cli import cli

if __name__ == "__main__":
    cli()
