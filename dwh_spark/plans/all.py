"""Import every plan module so the registry is fully populated.

Audit-order policy does NOT live here: cross-module imports make raw
registration order unreliable, so ``__spark_entry__.queries()``
re-orders the dict explicitly via its ``_CHECK_FIRST`` list (queries
without a driver verdict lead, long-green queries yield their slot).
"""

import dwh_spark.plans.av  # noqa: F401
import dwh_spark.plans.documents  # noqa: F401
import dwh_spark.plans.embeddings  # noqa: F401
import dwh_spark.plans.events  # noqa: F401
import dwh_spark.plans.images  # noqa: F401
import dwh_spark.plans.marketplace  # noqa: F401
import dwh_spark.plans.metadata  # noqa: F401
import dwh_spark.plans.pipeline_extra  # noqa: F401
import dwh_spark.plans.relational  # noqa: F401
import dwh_spark.plans.streaming  # noqa: F401
import dwh_spark.plans.temporal  # noqa: F401
import dwh_spark.plans.tpch_extra  # noqa: F401
