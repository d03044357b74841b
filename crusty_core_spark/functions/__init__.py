from crusty_core_spark.functions.canonicalize import (  # noqa: F401
    canonicalize_url,
    canonicalize_udf,
    url_host,
    url_scheme,
)
from crusty_core_spark.functions.extract import (  # noqa: F401
    extract_document,
    extract_pages,
    EXTRACT_SCHEMA,
)
