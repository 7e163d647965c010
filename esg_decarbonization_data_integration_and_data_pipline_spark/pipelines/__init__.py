"""Pipeline jobs: Spark-first replicas of the reference ETL DAG.

Every job is a pure function ``dict[str, DataFrame] -> DataFrame``
(SURVEY.md §7.1): inputs are named tables, output is the frame to
write; the writer policy (append / replace_range / replace_keys /
overwrite) is applied by the caller via io.writers. ``run_date`` is
always an explicit parameter (never now()).
"""
