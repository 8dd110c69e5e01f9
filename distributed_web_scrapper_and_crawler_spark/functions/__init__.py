from distributed_web_scrapper_and_crawler_spark.functions.canonicalize import (  # noqa: F401
    canonicalize_udf,
    normalize_url_py,
    canonicalize_url_py,
    url_parts_py,
)
from distributed_web_scrapper_and_crawler_spark.functions.fingerprint import (  # noqa: F401
    with_url_hash,
)
