"""In-memory mock transport — the test double for the RPC connector and
the executable documentation of the RpcTransport protocol.

Lives in the package (not tests/) because executor workers must be able
to import the transport class when the factory is pickled into
``mapInPandas`` — the same constraint any real transport implementation
has.

Deterministic rules: ``search_read`` returns n rows keyed off the
domain; ``create_batch`` assigns id = k*2 and fails rows with negative
``v`` (exercising the per-row error-isolation path).
"""

from __future__ import annotations


class MockTransport:
    def __init__(self):
        self.calls: list[int] = []

    def search_read(self, model, domain, fields):
        n = 7 if list(domain) == [("active", "=", True)] else 3
        return [{"id": i, "name": f"p{i}"} for i in range(n)]

    def create_batch(self, model, rows):
        self.calls.append(len(rows))
        out = []
        for r in rows:
            if r["v"] < 0:
                out.append({"ok": False, "id": None, "error": f"bad v={r['v']}"})
            else:
                out.append({"ok": True, "id": int(r["k"]) * 2, "error": None})
        return out


class RangeMockTransport:
    """Executor-importable transport honoring id-range slice domains —
    the test double for the rpc_model Python DataSource. Returns one
    row per id in [lo, hi) passing the extra domain, deterministic so
    any partitioning yields the same union."""

    def search_read(self, model, domain, fields):
        lo, hi = 0, 0
        rest = []
        for leaf in domain:
            f, op, v = leaf
            if f == "id" and op == ">=":
                lo = int(v)
            elif f == "id" and op == "<":
                hi = int(v)
            else:
                rest.append((f, op, v))

        def keep(i: int) -> bool:
            for f, op, v in rest:
                if f == "parity" and op == "=" and (i % 2) != int(v):
                    return False
            return True

        return [
            {"id": i, "name": f"rec{i}", "amount": float(i) * 1.5}
            for i in range(lo, hi)
            if keep(i)
        ]


def range_mock_factory():
    return RangeMockTransport()
