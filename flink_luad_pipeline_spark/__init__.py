"""flink_luad_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``saschajohannes/flink-luad-pipeline`` (Flink 0.10 batch DataSet pipeline,
570 LoC Scala: sparse COO expression matrix -> ALS completion -> Pearson
co-expression graph -> connected components -> SVM), built Spark-first:

- DataFrame / SQL declarative plans; Catalyst + AQE pick physical strategy.
- Broadcast joins replace the reference's driver-side ``collect`` + closure
  maps (Input.scala:104-142, PreProcess.scala:56, Trainer.scala:34).
- Explicit cache boundaries replace Flink 0.10's whole-DAG recomputation on
  every ``collect``/``count`` (~14 sites, see SURVEY.md §3.1).
- Connected components as a driver-side loop over DataFrames (the one
  construct with no Catalyst equivalent, PreProcess.scala:179-197).
- Beyond the reference: LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) and a Structured Streaming
  surface over event tables.

Layout:
    sources/    — readers & writers (S1-S6)
    operators/  — relational + matrix + graph operators (P/A/J/U/O, I1)
    functions/  — scalar/text/hash/vector column functions
    plans/      — the query registry consumed by __spark_entry__.py
    streaming/  — Structured Streaming operators (north-star surface)
    ml.py       — ALS completion, correlation, SVM (C1, C2, C4, C5)
    pipeline.py — end-to-end LUAD-equivalent composition
"""

__version__ = "0.1.0"
