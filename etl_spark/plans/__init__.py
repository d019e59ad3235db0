"""Query registry: every supported query as (Spark builder, oracle SQL).

Importing this package registers all query modules.
"""

from etl_spark.plans.registry import REGISTRY, Query, register  # noqa: F401

# Import for side effect: each module registers its queries.
from etl_spark.plans import relational  # noqa: E402,F401
from etl_spark.plans import windows  # noqa: E402,F401
from etl_spark.plans import setops  # noqa: E402,F401
from etl_spark.plans import scalars  # noqa: E402,F401
from etl_spark.plans import events  # noqa: E402,F401
from etl_spark.plans import llm_text  # noqa: E402,F401
from etl_spark.plans import bpe  # noqa: E402,F401
from etl_spark.plans import llm_dedup  # noqa: E402,F401
from etl_spark.plans import llm_similarity  # noqa: E402,F401
from etl_spark.plans import multimodal  # noqa: E402,F401
from etl_spark.plans import advanced  # noqa: E402,F401
from etl_spark.plans import frames  # noqa: E402,F401
from etl_spark.plans import sampling  # noqa: E402,F401
from etl_spark.plans import subqueries  # noqa: E402,F401
from etl_spark.plans import curation  # noqa: E402,F401
from etl_spark.plans import analytics  # noqa: E402,F401
from etl_spark.plans import ml  # noqa: E402,F401
from etl_spark.plans import ml_train  # noqa: E402,F401
from etl_spark.plans import quality  # noqa: E402,F401
from etl_spark.plans import stats  # noqa: E402,F401
from etl_spark.plans import timeseries  # noqa: E402,F401
from etl_spark.plans import lakehouse  # noqa: E402,F401
from etl_spark.plans import runtime_filters  # noqa: E402,F401
from etl_spark.plans import triad  # noqa: E402,F401
