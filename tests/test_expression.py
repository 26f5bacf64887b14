"""Expression engine + SysMon parity tests.

Reference semantics: /root/reference/src/utils/Expression.cpp
(RPN parser, typed int/float values, 1/2-arg functions, sto/rcl)
and src/utils/SysMon.cpp (variable groups, min/max peak tracking).
The example expressions are the reference's own
(examples/resilience-test/config.xml:64-66).
"""

import math

import pytest

from ls1_mardyn_tpu.utils.expression import Expression, VariableSet
from ls1_mardyn_tpu.utils.sysmon import SysMon


def ev(s, varset=None):
    return Expression(s, varset=varset).evaluate()


def test_rpn_basic_arithmetic():
    assert ev("1 2 +") == 3
    assert ev("10 4 -") == 6
    assert ev("3 4 *") == 12
    assert ev("7 2 /") == 3  # int/int truncates like C++
    assert ev("-7 2 /") == -3
    assert ev("7. 2 /") == 3.5
    assert ev("1 2 + 3 *") == 9


def test_int_float_typing():
    assert isinstance(ev("1 2 +"), int)
    assert isinstance(ev("1.5 2 +"), float)
    assert isinstance(ev("3 float"), float)
    assert isinstance(ev("3.7 int"), int)
    assert ev("3.7 floor") == 3
    assert ev("3.2 ceil") == 4
    assert ev("3.5 round") == 4


def test_functions():
    assert ev("4 sqrt") == pytest.approx(2.0)
    assert ev("1 exp") == pytest.approx(math.e)
    assert ev("8 log2") == pytest.approx(3.0)
    assert ev("100 lg") == pytest.approx(2.0)
    assert ev("2.718281828459045 ln") == pytest.approx(1.0)
    assert ev("0 sin") == pytest.approx(0.0)
    assert ev("0 cos") == pytest.approx(1.0)
    assert ev("3 5 min") == 3
    assert ev("3 5 max") == 5
    assert ev("7 3 mod") == 1
    assert ev("2 10 pow") == 1024
    # case-insensitive (Expression.cpp functype accepts both)
    assert ev("4 SQRT") == pytest.approx(2.0)


def test_variables():
    vs = VariableSet()
    vs.set_variable("grp:x", 5)
    vs.set_variable("grp", "y", 2.5)
    assert ev("grp:x grp:y *", vs) == pytest.approx(12.5)
    assert vs.exist_variable_group("grp")
    assert not vs.exist_variable_group("nope")
    # unset variables evaluate as 0 (reference Value() default)
    assert ev("grp:unset 1 +", vs) == 1


def test_sto_rcl():
    vs = VariableSet()
    # store 42 into slot 1, recall it (value stays on the stack)
    assert ev("42 1 sto", vs) == 42
    assert ev("1 rcl", vs) == 42


def test_reference_example_expression():
    """The exact expression from examples/resilience-test/config.xml:65
    parses and evaluates against synthetic sysinfo variables."""
    vs = VariableSet()
    vs.set_variable("sysinfo:freeram", 3 * 1048576)
    vs.set_variable("sysinfo:bufferram", 1048576)
    vs.set_variable("sysinfo:mem_unit", 1)
    v = ev(
        "sysinfo:freeram sysinfo:bufferram + sysinfo:mem_unit * "
        "float 1048576 /", vs,
    )
    assert v == pytest.approx(4.0)


def test_traversals_and_label():
    e = Expression("1 2 + 3 *")
    assert e.infix() == "((1 + 2) * 3)"
    assert e.postfix() == "1 2 + 3 *"
    assert e.prefix() == "* + 1 2 3"
    assert e.label == e.infix()  # genLabel default
    e2 = Expression("1 2 +", label="custom")
    assert e2.label == "custom"


def test_unknown_token_raises():
    with pytest.raises(ValueError):
        Expression("1 2 frobnicate")


def test_sysmon_procfs_roundtrip():
    sm = SysMon()
    i1 = sm.add_expression("procloadavg:loadavg1")
    i2 = sm.add_expression(
        "sysinfo:freeram sysinfo:bufferram + sysinfo:mem_unit * "
        "float 1048576 /", label="Free+BufferRAM [MB]",
    )
    i3 = sm.add_expression("procselfstatm:size 1048576. /")
    sm.update_expression_values()
    # loadavg >= 0, free RAM MB and process size are positive on any
    # Linux box this runs on
    assert sm.get_expression_value(i1) >= 0.0
    assert sm.get_expression_value(i2) > 0.0
    assert sm.get_expression_value(i3) > 0.0
    assert sm.get_expression_index("Free+BufferRAM [MB]") == i2
    info = sm.info_string("System Monitor\n", "\t")
    assert "Free+BufferRAM [MB]" in info
    assert "undefined" not in info
    # peak window widens monotonically
    sm.update_expression_values()
    lo, hi = sm.get_expression_min_max_peak_values(i1)
    assert lo <= hi


def test_sysmon_output_plugin_xml():
    """SysMonOutput consumes <expression> params incl. the label
    attribute (io/SysMonOutput.cpp:21-34)."""
    from ls1_mardyn_tpu.plugins.base import PluginFactory

    SysMon._instance = None  # fresh singleton
    p = PluginFactory.create(
        "SysMonOutput",
        {
            "writefrequency": 1,
            "expression": [
                "procloadavg:loadavg1",
                {"label": "RSS [MB]",
                 "#text": "procselfstatm:resident 1048576. /"},
            ],
        },
    )
    assert p.sysmon.num_expressions() == 2
    assert p.sysmon.get_expression_index("RSS [MB]") == 1
    p.sysmon.update_expression_values()
    assert p.sysmon.get_expression_value(1) > 0.0
