"""Declarative rule plans: Rule/RuleSet records + the rule-fusion compiler."""

from seronet_data_validator_spark.plans.rules import Rule, RuleSet, Precondition
from seronet_data_validator_spark.plans.compile import compile_ruleset

__all__ = ["Rule", "RuleSet", "Precondition", "compile_ruleset"]
