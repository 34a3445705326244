"""tools/launch_distributed.py: rank wiring, output prefixing, failure
propagation — exercised with tiny stub "trainers" (no JAX involved)."""

import io
import sys

from tools.launch_distributed import launch

# a stub trainer: parses the --dist-* flags the launcher appends and prints
# them; exit code taken from FAIL_RANK
_STUB = r"""
import sys
args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
pid = args["--dist-process-id"]
print("rank", pid, "of", args["--dist-num-processes"],
      "coord", args["--dist-coordinator"], flush=True)
sys.exit(1 if pid == {fail} else 0)
"""


def _run(n, fail_rank="None"):
    out = io.StringIO()
    rc = launch(n, [sys.executable, "-c", _STUB.format(fail=fail_rank)],
                stream=out)
    return rc, out.getvalue()


def test_launch_success_and_prefixing():
    rc, out = _run(2)
    assert rc == 0
    # rank 0 streams unprefixed; rank 1 gets the "[rank 1] " prefix
    assert "rank 0 of 2" in out and "[rank 1] rank 1 of 2" in out
    assert "[rank 0]" not in out
    # both ranks were handed the same coordinator endpoint
    coords = {ln.split("coord ")[1] for ln in out.splitlines() if "coord" in ln}
    assert len(coords) == 1 and coords.pop().startswith("localhost:")


def test_launch_propagates_failure():
    rc, _ = _run(2, fail_rank="'1'")
    assert rc == 1


def test_launch_empty_command():
    import pytest

    with pytest.raises(ValueError):
        launch(2, [])
