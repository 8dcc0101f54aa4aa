"""Query planning: matcher compiler, read planner, rollup scheduler."""

from remote_storage_adapter_spark.plans.matchers import (  # noqa: F401
    LabelMatcher,
    PromQuery,
    compile_matchers,
    compile_time_range,
)
from remote_storage_adapter_spark.plans.read import (  # noqa: F401
    compute_step_s,
    read_query,
)
