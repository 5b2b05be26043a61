"""Smoke tests: every example runs end-to-end (tiny sizes, xla kind —
the examples' own oracles assert correctness internally)."""

import runpy
import sys

import pytest

EXAMPLES = {
    "examples/pagerank.py": ["--kind", "xla", "--nodes", "800",
                             "--edges", "4000"],
    "examples/bfs.py": ["--kind", "xla", "--nodes", "600",
                        "--edges", "3000"],
    "examples/shortest_paths.py": ["400", "xla"],
    "examples/solve_poisson.py": ["12"],
}


@pytest.mark.parametrize("path", sorted(EXAMPLES))
def test_example_runs(path, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", [path] + EXAMPLES[path])
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert out  # printed its report; internal asserts did not fire
