"""The judged query battery.

Every module in this package registers queries into ``registry.REGISTRY``
via the ``@query`` decorator; ``__spark_entry__`` exposes them to the driver.
Import side effects are intentional: ``load_all_modules()`` pulls every
battery module in.
"""

from wd2sql_spark.queries.registry import REGISTRY, Query, load_all_modules, query

__all__ = ["REGISTRY", "Query", "query", "load_all_modules"]
