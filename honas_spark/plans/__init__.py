from .inspect import (
    assert_columns_pruned,
    assert_max_shuffles,
    formatted_plan,
    plan_summary,
)
