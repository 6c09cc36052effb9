"""Config parsing/validation (reference O21,
``JdbcAuditSinkConfig.java:102-168`` + ``testDeleteAsUpdate`` intent)."""

from __future__ import annotations

import pytest

from kafka_jdbc_sink_connector_spark.config import (
    ConfigError,
    DeleteMode,
    InsertMode,
    SinkConfig,
    parse_conditions,
)


def test_condition_list_parse():
    assert parse_conditions("OP_TYPE=D") == [("OP_TYPE", "D")]
    assert parse_conditions("OP_TYPE=D,HIST=null") == [
        ("OP_TYPE", "D"),
        ("HIST", None),
    ]


def test_condition_parse_errors():
    with pytest.raises(ConfigError):
        parse_conditions("no_equals_sign")
    with pytest.raises(ConfigError):
        parse_conditions("")
    with pytest.raises(ConfigError):
        parse_conditions("=value")


def test_enum_validation():
    cfg = SinkConfig(insert_mode="upsert", delete_mode="update")
    assert cfg.insert_mode is InsertMode.UPSERT
    assert cfg.delete_mode is DeleteMode.UPDATE
    with pytest.raises(ValueError):
        SinkConfig(insert_mode="bogus")
    with pytest.raises(ValueError):
        SinkConfig(delete_mode="bogus")


def test_soft_delete_conditions_from_string():
    cfg = SinkConfig(soft_delete_conditions="op_type=D,hist=null")
    assert cfg.soft_delete_column == "op_type"
    assert cfg.soft_delete_value == "D"
    assert cfg.soft_delete_conditions == (("op_type", "D"), ("hist", None))


def test_marker_value_null_rejected():
    with pytest.raises(ConfigError):
        SinkConfig(soft_delete_conditions="op_type=null")


def test_delete_key_defaults_to_pk():
    cfg = SinkConfig(pk_fields=("a", "b"))
    assert cfg.delete_as_update_key == ("a", "b")


def test_retain_fields_deduped_against_pk():
    cfg = SinkConfig(pk_fields=("conv_id", "turn_idx"),
                     delete_retain_fields=("conv_id", "ts"))
    assert cfg.delete_retain_fields == ("ts",)


def test_table_name_format():
    cfg = SinkConfig(table_name_format="audit_${topic}")
    assert cfg.table_name("orders") == "audit_orders"
    with pytest.raises(ConfigError):
        SinkConfig(table_name_format="").table_name("x")


def test_empty_pk_rejected():
    with pytest.raises(ConfigError):
        SinkConfig(pk_fields=())


def test_audit_scn_column_accepted_and_ignored():
    # dead config in the reference (JdbcAuditSinkConfig.java:97-107)
    cfg = SinkConfig(audit_scn_column="SCN=null")
    assert cfg.audit_scn_column == "SCN=null"
