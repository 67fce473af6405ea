from hdfe_spark.plans.audit import (
    explain_string,
    plan_report,
    assert_plan,
)

__all__ = ["explain_string", "plan_report", "assert_plan"]
