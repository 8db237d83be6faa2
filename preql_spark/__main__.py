"""``python -m preql_spark [data_dir]`` — launch the interactive
console (reference: the ``preql`` entry point, preql/__main__.py)."""

from preql_spark.repl import main

main()
