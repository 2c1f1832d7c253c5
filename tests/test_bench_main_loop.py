"""bench.main()'s variant loop mechanics, with children and the device
preflight mocked out (fast — no accelerator, no subprocess JAX).

The loop is the driver's round-scoring path: a regression here (e.g. the
(spec, budget, reserve) tuple shape) would cost the round ALL its banked
numbers, so the mechanics get a real unit test:

- banked variants' JSON lines are forwarded verbatim, in order;
- a reserve-carrying variant is SKIPPED when remaining budget cannot cover
  its budget plus the reserve (headline protection), and runs otherwise;
- bf16 fallbacks are skipped once anything is banked;
- rc!=0 children don't bank and don't abort the loop.
"""

import json
import types

import bench


class _FakeProc:
    def __init__(self, rc, stdout):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = ""


def _run_main(monkeypatch, capsys, variants, budget_s=10_000, child=None):
    monkeypatch.setattr(bench, "_preflight", lambda *a, **k: True)
    monkeypatch.setattr(bench, "VARIANTS", tuple(variants))
    monkeypatch.setenv("BENCH_BUDGET_S", str(budget_s))
    calls = []

    def fake_run(argv, **kw):
        spec = argv[-1]
        calls.append(spec)
        if child:
            return child(spec)
        return _FakeProc(0, json.dumps({"metric": spec, "value": 1}) + "\n")

    monkeypatch.setattr(
        bench, "subprocess", types.SimpleNamespace(run=fake_run, TimeoutExpired=Exception)
    )
    bench.main()
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    return calls, out


def test_banked_lines_forwarded_in_order(monkeypatch, capsys):
    calls, out = _run_main(
        monkeypatch, capsys,
        [("32:int8:bs8", 60, 0), ("32:int8:bs1:eval", 60, 0)],
    )
    assert calls == ["32:int8:bs8", "32:int8:bs1:eval"]
    assert [json.loads(l)["metric"] for l in out] == calls
    # the LAST printed line is the driver's parsed headline
    assert json.loads(out[-1])["metric"] == "32:int8:bs1:eval"


def test_reserve_skips_optional_variant_when_budget_tight(monkeypatch, capsys):
    # 700s budget: optional (600s budget + 900s reserve) cannot fit, the
    # 600s headline still runs
    calls, _ = _run_main(
        monkeypatch, capsys,
        [("32:int8:bs8:eval", 600, 900), ("32:int8:bs1:eval", 600, 0)],
        budget_s=700,
    )
    assert calls == ["32:int8:bs1:eval"]


def test_reserve_variant_runs_when_budget_ample(monkeypatch, capsys):
    calls, _ = _run_main(
        monkeypatch, capsys,
        [("32:int8:bs8:eval", 600, 900), ("32:int8:bs1:eval", 600, 0)],
        budget_s=5_000,
    )
    assert calls == ["32:int8:bs8:eval", "32:int8:bs1:eval"]


def test_bf16_fallbacks_skipped_once_banked(monkeypatch, capsys):
    calls, _ = _run_main(
        monkeypatch, capsys,
        [("16:bf16:bs8", 60, 0), ("8:bf16:bs8", 60, 0), ("32:int8:bs8", 60, 0)],
    )
    assert calls == ["16:bf16:bs8", "32:int8:bs8"]


def test_failed_child_does_not_bank_or_abort(monkeypatch, capsys):
    def child(spec):
        if spec == "32:int8:bs8":
            return _FakeProc(1, "")
        return _FakeProc(0, json.dumps({"metric": spec, "value": 1}) + "\n")

    calls, out = _run_main(
        monkeypatch, capsys,
        [("32:int8:bs8", 60, 0), ("32:int8:bs1:eval", 60, 0)],
        child=child,
    )
    assert calls == ["32:int8:bs8", "32:int8:bs1:eval"]
    assert [json.loads(l)["metric"] for l in out] == ["32:int8:bs1:eval"]


def test_shipped_variants_shape_and_headline():
    """The real VARIANTS table: 3-tuples, bs=1 eval LAST (the parsed
    headline), the optional batched-eval reserve covers the headline."""
    assert all(len(v) == 3 for v in bench.VARIANTS)
    assert bench.VARIANTS[-1][0] == "32:int8:bs1:eval"
    opt = {s: r for s, b, r in bench.VARIANTS if r}
    assert opt["32:int8:bs8:eval"] >= bench.VARIANTS[-1][1]
