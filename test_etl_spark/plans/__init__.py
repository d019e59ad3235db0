"""Query registry: every supported query as (Spark builder, oracle SQL).

Importing this package registers all query modules.
"""

from test_etl_spark.plans.registry import REGISTRY, Query, register  # noqa: F401

# Import for side effect: each module registers its queries.
from test_etl_spark.plans import relational  # noqa: E402,F401
from test_etl_spark.plans import events  # noqa: E402,F401
from test_etl_spark.plans import llmops  # noqa: E402,F401
