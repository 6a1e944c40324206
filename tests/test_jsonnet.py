"""Unit tests for the mini-jsonnet evaluator (rspnet_tpu/config/jsonnet.py)."""
import json

import pytest

from rspnet_tpu.config.jsonnet import JsonnetError, evaluate_snippet


def ev(src, **kw):
    return json.loads(evaluate_snippet("<test>", src, **kw))


def test_literals_and_arithmetic():
    assert ev("1 + 2 * 3") == 7
    assert ev("(1 + 2) * 3") == 9
    assert ev("10 / 4") == 2.5
    assert ev("'a' + 'b'") == "ab"
    assert ev("'x' + 1") == "x1"
    assert ev("[1, 2] + [3]") == [1, 2, 3]
    assert ev("true && false") is False
    assert ev("!false") is True
    assert ev("null") is None
    assert ev("-5 + 2") == -3


def test_local_bindings():
    assert ev("local x = 3; local y = x * 2; y + 1") == 7
    assert ev("local f(a, b=10) = a + b; f(1) + f(1, 2)") == 14


def test_object_basic():
    assert ev("{a: 1, b: $.a + 1}") == {"a": 1, "b": 2}
    assert ev("{a:: 5, b: self.a * 2}") == {"b": 10}


def test_object_inheritance():
    out = ev("{a: 1, c: self.a + 10} + {a: 2}")
    assert out == {"a": 2, "c": 12}  # late-bound self
    out = ev("{a: 1} {b: 2}")  # juxtaposition sugar
    assert out == {"a": 1, "b": 2}


def test_plus_colon_merge():
    out = ev("{o: {x: 1, y: 2}} + {o+: {y: 3}}")
    assert out == {"o": {"x": 1, "y": 3}}
    # +: with no base field behaves like plain ':'
    out = ev("{} + {o+: {y: 3}}")
    assert out == {"o": {"y": 3}}


def test_super():
    out = ev("{a: 1, b: 2} + {a: super.a + 10, c: super.b}")
    assert out == {"a": 11, "b": 2, "c": 2}
    assert ev("{a: 1} + {b: if 'a' in super then 'yes' else 'no'}")["b"] == "yes"


def test_dollar_late_binding():
    # $ resolves against the final composed object (the s3dg.jsonnet pattern).
    out = ev("{arch: 'x', model: {arch: $.arch}} + {arch: 'y'}")
    assert out["model"]["arch"] == "y"


def test_hidden_visibility_inherited():
    # ':' on an override of a hidden field keeps it hidden.
    out = ev("{h:: 1} + {h: 2, v: self.h}")
    assert out == {"v": 2}
    # ':::' forces visibility.
    out = ev("{h:: 1} + {h::: 2}")
    assert out == {"h": 2}


def test_object_locals_late_bound():
    # Object-level local referencing self (the hmdb51_r2plus1d pattern).
    src = """
    {size: 4} + {
      local factor = 16 / self.size,
      batch: 2 * factor,
    } + {size: 8}
    """
    assert ev(src)["batch"] == 4


def test_conditionals_and_std():
    assert ev("if std.length([1,2]) == 0 then 'a' else 'b'") == "b"
    assert ev("std.floor(64 * 2 / 10)") == 12
    assert ev("std.max(std.floor(3 / 10), 2)") == 2
    assert ev("std.min(3, 2)") == 2
    assert ev("std.join('-', ['a', 'b'])") == "a-b"
    assert ev("std.range(1, 3)") == [1, 2, 3]


def test_string_format():
    assert ev("'%s.yaml' % 'X'") == "X.yaml"
    assert ev("'%d-%d' % [1, 2]") == "1-2"


def test_comprehension():
    assert ev("[x * 2 for x in [1, 2, 3] if x > 1]") == [4, 6]


def test_object_assert():
    with pytest.raises(JsonnetError):
        ev("{assert self.a == 1, a: 2}")
    assert ev("{assert self.a == 1, a: 1}") == {"a": 1}


def test_error_and_assert_expr():
    with pytest.raises(JsonnetError, match="boom"):
        ev("error 'boom'")
    assert ev("assert 1 == 1; 42") == 42
    with pytest.raises(JsonnetError):
        ev("assert 1 == 2 : 'nope'; 42")


def test_import_callback():
    files = {"lib.libsonnet": "{v: 7}"}

    def cb(dir, rel):
        return rel, files[rel]

    assert ev("local l = import 'lib.libsonnet'; l.v + 1", import_callback=cb) == 8


def test_hidden_mixin_with_super():
    # addition.libsonnet `linear` pattern: hidden mixin using super.
    src = """
    local add = {
      linear:: {only_train_fc: true, batch_size: super.base_batch_size * 8},
    };
    {base_batch_size:: 64, batch_size: 1} + add.linear
    """
    out = ev(src)
    assert out == {"only_train_fc": True, "batch_size": 512}


def test_nested_dollar_object():
    # $.linear { ... } pattern from finetune addition.libsonnet.
    src = """
    {
      linear:: {mode: 'linear', epochs: 30},
      smth:: $.linear {epochs: 16},
      out: self.smth,
    }
    """
    assert ev(src)["out"] == {"mode": "linear", "epochs": 16}


def test_slices_and_indexing():
    assert ev("[10, 20, 30][1]") == 20
    assert ev("'abcdef'[1:4]") == "bcd"
    assert ev("{a: {b: {c: 3}}}.a.b.c") == 3
    assert ev("{'quoted field': 1}") == {"quoted field": 1}


def test_lazy_fields_no_spurious_eval():
    # A field whose body would error must not be evaluated if hidden+unused.
    assert ev("{bad:: error 'never', good: 1}") == {"good": 1}
