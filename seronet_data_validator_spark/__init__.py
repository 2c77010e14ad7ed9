"""seronet_data_validator_spark — a from-scratch PySpark-native validation engine.

Re-expresses the rule semantics of CBIIT/seronet-data-validator (reference at
/root/reference, pandas, single-threaded) as an idiomatic, distributed Spark
engine: declarative RuleSets compiled into ONE fused DataFrame pass per table
(scan once, not once per rule), violation rows as DataFrames (never driver-side
appends), salted aggregations and broadcast anti-joins for uniqueness and
referential integrity at 10^12-row scale, one-pass column profiling with
HLL/quantile sketches and KS/PSI drift, Arrow pandas UDFs for the decoded-PCM
audio invariant, and partition-level checkpoint/resume.

Nothing here is a port: the reference tells us WHAT to compute (see SURVEY.md
for the file:line contract per check primitive C1..C22); the HOW is
DataFrame/Catalyst throughout.
"""

from seronet_data_validator_spark.model import (
    SEVERITY_ERROR,
    SEVERITY_NOT_VALIDATED,
    SEVERITY_WARNING,
    VIOLATION_SCHEMA,
)
from seronet_data_validator_spark.plans.rules import Rule, RuleSet
from seronet_data_validator_spark.plans.compile import compile_ruleset
from seronet_data_validator_spark.session import get_spark

__all__ = [
    "SEVERITY_ERROR",
    "SEVERITY_WARNING",
    "SEVERITY_NOT_VALIDATED",
    "VIOLATION_SCHEMA",
    "Rule",
    "RuleSet",
    "compile_ruleset",
    "get_spark",
]

__version__ = "0.1.0"
