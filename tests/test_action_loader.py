"""Action registry + CLI tests (≙ free_gait_action_loader services and
the rqt action/control-panel tooling, SURVEY.md §2.7)."""

import os

import numpy as np
import pytest

from quadruped_locomotion_tpu.api.action_loader import (
    ActionRegistry,
    default_registry,
)
from quadruped_locomotion_tpu.api.cli import main as cli_main

API_DIR = os.path.join(
    os.path.dirname(__file__), "..", "quadruped_locomotion_tpu", "api"
)


def test_default_registry_discovers_bundled_actions():
    reg = default_registry()
    ids = {a.id for a in reg.list_actions()}
    assert {"sitdown", "standup", "leg_move"} <= ids
    for a in reg.list_actions():
        assert os.path.exists(a.file), a.file


def test_collections_and_filtering():
    reg = default_registry()
    colls = {c.id for c in reg.list_collections()}
    assert {"sit_stand", "walk_demo"} <= colls
    names = [a.id for a in reg.list_actions("sit_stand")]
    assert names == ["sitdown", "standup"]


def test_bare_directory_root():
    reg = ActionRegistry([os.path.join(API_DIR, "motion_scripts")])
    ids = {a.id for a in reg.list_actions()}
    assert "standup" in ids and "leg_move" in ids


def test_compile_sequence_requires_sequence_flag():
    reg = default_registry()
    import jax.numpy as jnp

    z3 = jnp.zeros(3)
    q = jnp.array([1.0, 0, 0, 0])
    feet = jnp.zeros((4, 3))
    scheds = reg.compile_sequence("sit_stand", z3, q, feet)
    assert len(scheds) == 2
    # non-sequence lookups raise
    reg.collections["notseq"] = reg.collections["sit_stand"].__class__(
        id="notseq", name="x", action_ids=("standup",), is_sequence=False
    )
    with pytest.raises(ValueError):
        reg.compile_sequence("notseq", z3, q, feet)


def test_cli_list_and_update(capsys):
    assert cli_main(["list-actions"]) == 0
    out = capsys.readouterr().out
    assert "stand up" in out
    assert cli_main(["list-collections"]) == 0
    assert "walk_demo" in capsys.readouterr().out
    assert cli_main(["update"]) == 0
    assert "actions" in capsys.readouterr().out


def test_cli_preview_runs_kinematic_batch(capsys, tmp_path):
    out_npz = str(tmp_path / "batch.npz")
    rc = cli_main(
        ["preview", "leg_move", "--ticks", "400", "--out", out_npz]
    )
    assert rc == 0
    import json

    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["completed"] is True
    data = np.load(out_npz)
    assert data["feet_world"].shape == (400, 4, 3)
