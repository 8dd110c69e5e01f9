from distributed_web_scrapper_and_crawler_spark.sources.corpus import (  # noqa: F401
    SPANS_SPARK_SCHEMA,
    CORPUS_SPARK_SCHEMA,
    generate_corpus,
    write_corpus_parquet,
    read_corpus,
    corpus_df,
)
