from .publish import (  # noqa: F401
    copy_to_sqlite,
    http_batch_payloads,
    publish_models,
    sql_dump,
)
