"""Scenario parsing and initial state vs the oracle (main.c:209-274)."""

import numpy as np
import pytest

from euler_tpu.config import SimConfig
from euler_tpu.core.scenario import build_scenario, parse_scenario_text

from helpers import read_scenario, sorted_positions
from oracle.oracle import Oracle

SCENARIOS = ["basic.txt", "block.txt", "filter.txt", "waterfall.txt", "weird-edges.txt"]


@pytest.mark.parametrize("name", SCENARIOS)
def test_masks_match_oracle(name):
    text = read_scenario(name)
    cfg = SimConfig()
    ora = Oracle(text)
    solid, fluid, source, sink = parse_scenario_text(text, cfg)
    np.testing.assert_array_equal(solid, ora.solid)
    np.testing.assert_array_equal(source, ora.source)
    np.testing.assert_array_equal(sink, ora.sink)


@pytest.mark.parametrize("name", SCENARIOS)
def test_initial_state_matches_oracle(name):
    text = read_scenario(name)
    cfg = SimConfig()
    ora = Oracle(text)
    scn, st = build_scenario(text, cfg)

    assert int(st.alive_count) == len(ora.markers)
    np.testing.assert_array_equal(
        np.asarray(st.marker_count), ora.marker_count
    )
    np.testing.assert_array_equal(
        np.asarray(st.prev_marker_count), ora.prev_marker_count
    )
    # exact same marker positions (same RNG stream, same seeding order)
    np.testing.assert_array_equal(
        sorted_positions(st.markers, st.alive),
        sorted_positions(ora.markers_array(), np.ones(len(ora.markers), bool)),
    )
    # RNG stream position identical after seeding
    from euler_tpu.core.rng import state_from_u32_pair

    assert state_from_u32_pair(np.asarray(st.rng)) == ora.rng.state


def test_border_ring_is_sink():
    cfg = SimConfig()
    _, _, _, sink = parse_scenario_text(read_scenario("basic.txt"), cfg)
    assert sink[0, :].all() and sink[-1, :].all()
    assert sink[:, 0].all() and sink[:, -1].all()


def test_overwide_lines_truncated():
    cfg = SimConfig(nx=10, ny=6)
    # line longer than interior width (8): excess discarded to newline
    text = "0" * 50 + "\nX\n"
    solid, fluid, source, sink = parse_scenario_text(text, cfg)
    assert fluid[cfg.ny - 2, 1 : cfg.nx - 1].all()
    assert not fluid[cfg.ny - 3].any()
    assert solid[cfg.ny - 3, 1]


def test_rainbow_colorize_matches_oracle():
    text = read_scenario("basic.txt")
    cfg = SimConfig(rainbow=True)
    ora = Oracle(text, rainbow=True)
    scn, st = build_scenario(text, cfg)
    np.testing.assert_allclose(np.asarray(st.r), ora.r, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.g), ora.g, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.b), ora.b, atol=1e-6)


def test_models_registry():
    from euler_tpu import models

    assert set(models.names()) >= {"basic", "waterfall", "dam_break"}
    cfg = SimConfig()
    scn, st = models.load("basic", cfg)
    assert int(st.alive_count) > 0
    cfg2 = SimConfig(nx=64, ny=48)
    scn2, st2 = models.load("dam_break", cfg2)
    assert int(st2.alive_count) > 0
    with pytest.raises(KeyError):
        models.load("nope")
