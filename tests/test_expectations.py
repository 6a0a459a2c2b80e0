"""Expectation-compiler self-tests (SURVEY.md §5 strategy #3): each of
the four expectation types gets a pass case and a violated case,
mirroring the only error paths the reference defines
(local_runner.py:76, :84, :91, :98, :102)."""

from __future__ import annotations

import pytest

from aws_lakehouse_project_spark.errors import ExpectationFailure, SchemaContractError
from aws_lakehouse_project_spark.quality.expectations import Expectation, validate


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", 10.0),
            (2, "b@y.org", 0.0),
            (3, "c@z.net", 5.5),
        ],
        "id INT, email STRING, amount DOUBLE",
    )


def test_ordered_columns_pass_and_fail(spark, people):
    ok = Expectation(
        "expect_table_columns_to_match_ordered_list",
        {"column_list": ["id", "email", "amount"]},
    )
    assert validate(people, [ok]) == {ok.label(): 0}
    wrong_order = Expectation(
        "expect_table_columns_to_match_ordered_list",
        {"column_list": ["email", "id", "amount"]},
    )
    with pytest.raises(ExpectationFailure):
        validate(people, [wrong_order])


def test_not_null_pass_and_fail(spark, people):
    ok = Expectation("expect_column_values_to_not_be_null", {"column": "id"})
    assert validate(people, [ok])[ok.label()] == 0
    with_null = people.union(
        spark.createDataFrame([(None, "d@w.io", 1.0)], people.schema)
    )
    with pytest.raises(ExpectationFailure, match="id"):
        validate(with_null, [ok])


def test_min_bound_pass_and_fail(spark, people):
    ok = Expectation(
        "expect_column_values_to_be_between", {"column": "amount", "min_value": 0}
    )
    assert validate(people, [ok])[ok.label()] == 0
    bad = Expectation(
        "expect_column_values_to_be_between", {"column": "amount", "min_value": 1}
    )
    with pytest.raises(ExpectationFailure, match="amount"):
        validate(people, [bad])


def test_regex_pass_and_fail(spark, people):
    ok = Expectation(
        "expect_column_values_to_match_regex",
        {"column": "email", "regex": r"^.+@.+\..+$"},
    )
    assert validate(people, [ok])[ok.label()] == 0
    strict = Expectation(
        "expect_column_values_to_match_regex",
        {"column": "email", "regex": r"^.+@x\.com$"},
    )
    with pytest.raises(ExpectationFailure):
        validate(people, [strict])


def test_whole_suite_single_pass(spark, people):
    """Several row expectations compile into one aggregation — validated
    by the returned per-expectation counts."""
    suite = [
        Expectation("expect_column_values_to_not_be_null", {"column": "email"}),
        Expectation(
            "expect_column_values_to_be_between", {"column": "amount", "min_value": 0}
        ),
        Expectation(
            "expect_column_values_to_match_regex",
            {"column": "email", "regex": r"^.+@.+$"},
        ),
    ]
    counts = validate(people, suite)
    assert set(counts.values()) == {0}


def test_enforce_ordered_columns(spark, people):
    from aws_lakehouse_project_spark.sources.readers import enforce_ordered_columns

    assert enforce_ordered_columns(people, ["id", "email", "amount"]) is people
    with pytest.raises(SchemaContractError):
        enforce_ordered_columns(people, ["id", "amount", "email"])
