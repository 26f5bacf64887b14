"""Every config in the reference's own CI example list
(examples/example-list.txt, the run-examples.sh input) must parse
through our XML reader -- the user-facing schema contract.  Plus the
412-line all-options.xml exercising every option."""

import os

import pytest

from ls1_mardyn_tpu.io.xml_config import read_xml_config

EX = "/root/reference/examples"


def _listed_configs():
    lst = f"{EX}/example-list.txt"
    if not os.path.exists(lst):
        return []
    out = []
    for line in open(lst):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        p = os.path.normpath(os.path.join(EX, line))
        if os.path.exists(p):
            out.append(p)
    return out


CONFIGS = _listed_configs()


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, EX) for p in CONFIGS]
)
def test_listed_example_parses(path):
    cfg = read_xml_config(path)
    assert cfg.timestep > 0
    assert cfg.steps >= 0


def test_all_options_parses():
    p = f"{EX}/all-options.xml"
    if not os.path.exists(p):
        pytest.skip("all-options.xml not available")
    cfg = read_xml_config(p)
    assert cfg.timestep > 0
    assert len(cfg.components) >= 1
    assert cfg.output_plugins or cfg.plugins
