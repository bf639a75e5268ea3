"""Differential pydantic-v2 integration tests vs the live reference.

The reference makes any ``DataFrameModel`` subclass usable as a pydantic
FIELD TYPE whose value is the model class itself
(/root/reference/pandera/api/dataframe/model.py:648-707:
``pydantic_validate`` + ``__get_pydantic_core_schema__``), which its
pyspark ``DataFrameModel`` inherits.  These tests build the SAME pydantic
container around a reference pyspark model and ours and assert identical
accept / reject behavior (same exception types, same message shapes).

Documented divergence (json-schema): the reference pyspark model cannot
emit a pydantic json-schema — its ``__get_pydantic_json_schema__``
handler raises ``PydanticInvalidForJsonSchema`` on the plain-validator
core schema (and its ``to_json_schema`` is ``NotImplementedError``).
Ours returns the model's working ``to_json_schema`` dict; both behaviors
are pinned below.

No SparkSession needed: ``to_schema()`` is pure metadata on both engines.
"""

from __future__ import annotations

import pytest

pydantic = pytest.importorskip("pydantic")

if int(pydantic.VERSION.split(".")[0]) < 2:  # pragma: no cover
    pytest.skip("pydantic v2 required", allow_module_level=True)

import pandera_spark as ps
from tests.test_reference_conformance import pa as ref

pytestmark = pytest.mark.skipif(
    ref is None, reason="reference pandera tree not importable"
)


def _models():
    class OursBase(ps.DataFrameModel):
        a: str = ps.Field(str_startswith="x")
        n: int = ps.Field(ge=0)

    class OursSub(OursBase):
        extra: float

    class OursOther(ps.DataFrameModel):
        z: int

    class RefBase(ref.DataFrameModel):
        a: str = ref.Field(str_startswith="x")
        n: int = ref.Field(ge=0)

    class RefSub(RefBase):
        extra: float

    class RefOther(ref.DataFrameModel):
        z: int

    return (OursBase, OursSub, OursOther), (RefBase, RefSub, RefOther)


def _holder(model_cls):
    # create_model: the annotation must be the class OBJECT (a class-body
    # annotation would stringify under PEP 563 and never resolve to the
    # closure variable)
    return pydantic.create_model("Holder", m=(model_cls, ...))


class TestPydanticFieldAcceptReject:
    def test_accepts_self_and_subclass_identically(self):
        (ob, osub, _), (rb, rsub, _) = _models()
        for base, sub in ((ob, osub), (rb, rsub)):
            holder = _holder(base)
            assert holder(m=base).m is base
            assert holder(m=sub).m is sub

    def test_rejects_unrelated_model_same_error(self):
        # pydantic v2 plain validators propagate TypeError raw (only
        # ValueError/AssertionError fold into ValidationError) — the
        # live reference behaves identically, verified side by side
        (ob, _, oother), (rb, _, rother) = _models()
        msgs = []
        for base, other in ((ob, oother), (rb, rother)):
            holder = _holder(base)
            with pytest.raises(TypeError) as exc:
                holder(m=other)
            msgs.append(str(exc.value))
        assert all("does not inherit" in m for m in msgs)

    def test_rejects_non_class_same_error(self):
        (ob, _, _), (rb, _, _) = _models()
        msgs = []
        for base in (ob, rb):
            holder = _holder(base)
            with pytest.raises(TypeError) as exc:
                holder(m=42)
            msgs.append(str(exc.value))
        assert msgs[0] == msgs[1] == (
            "42 is not a pandera.DataFrameModel"
        )

    def test_direct_pydantic_validate_typeerrors_match(self):
        (ob, _, oother), (rb, _, rother) = _models()
        with pytest.raises(TypeError) as ours:
            ob.pydantic_validate(oother)
        with pytest.raises(TypeError) as refs:
            rb.pydantic_validate(rother)
        # identical shape: "<Other> does not inherit <Base>."
        assert str(ours.value).endswith("does not inherit "
                                        f"{ob}.")
        assert str(refs.value).endswith("does not inherit "
                                        f"{rb}.")


class TestPydanticJsonSchema:
    def test_reference_raises_ours_returns_schema(self):
        from pydantic.errors import PydanticInvalidForJsonSchema

        (ob, _, _), (rb, _, _) = _models()
        with pytest.raises(PydanticInvalidForJsonSchema):
            _holder(rb).model_json_schema()
        js = _holder(ob).model_json_schema()
        # the field schema is the model's to_json_schema, inlined
        m = js["properties"]["m"]
        assert m["type"] == "object"
        assert set(m["properties"]) == {"a", "n"}
        assert m["properties"]["a"]["type"] == "string"
        assert m["properties"]["n"]["type"] == "bigint"
        assert sorted(m["required"]) == ["a", "n"]

    def test_json_schema_matches_to_json_schema(self):
        (ob, _, _), _ = _models()
        js = _holder(ob).model_json_schema()["properties"]["m"]
        direct = ob.to_json_schema()
        assert js == direct


class TestPydanticSchemaInitFold:
    def test_broken_model_folds_to_value_error(self):
        # a model whose to_schema() raises SchemaInitError must fold to
        # ValueError (reference model.py:656-665); @check on an unknown
        # field is the canonical trigger in our engine
        class Broken(ps.DataFrameModel):
            a: int

            @ps.check("missing_field")
            def positive(cls, col):  # pragma: no cover - never runs
                return col > 0

        with pytest.raises(ValueError, match="revisit the model"):
            ps.DataFrameModel.pydantic_validate(Broken)

    def test_nested_in_larger_config_model(self):
        # the motivating use case: a validated-pipeline settings object
        (ob, _, _), _ = _models()

        PipelineConfig = pydantic.create_model(
            "PipelineConfig",
            name=(str, ...),
            shard_count=(int, ...),
            input_schema=(ob, ...),
        )

        cfg = PipelineConfig(name="t", shard_count=4, input_schema=ob)
        assert cfg.input_schema is ob
        rt = PipelineConfig.model_validate(
            {"name": "t", "shard_count": 4, "input_schema": ob}
        )
        assert rt.input_schema is ob
