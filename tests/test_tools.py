"""Sandbox interpreter, tool interface, and RPC server tests."""

import json
import threading

import pytest

from lapha_tpu.tools import (
    FinalAnswerException,
    Interpreter,
    InterpreterError,
    IPythonInterpreter,
    LocalPythonExecutor,
    evaluate_python_code,
    execute_python_code,
)


# ---------------------------------------------------------------- sandbox core

def test_arithmetic_and_state():
    interp = Interpreter()
    assert interp.run("x = 2 + 3\nx * 4") == 20
    assert interp.state["x"] == 5
    assert interp.run("x + 1") == 6  # state persists


def test_print_capture():
    interp = Interpreter()
    interp.run("print('hello', 42)\nprint('bye')")
    assert str(interp.print_output) == "hello 42\nbye\n"


def test_control_flow():
    r, _ = evaluate_python_code("""
total = 0
for i in range(10):
    if i % 2 == 0:
        total += i
    else:
        continue
total
""")
    assert r == 20


def test_while_and_break():
    r, _ = evaluate_python_code("""
i = 0
while True:
    i += 1
    if i >= 5:
        break
i
""")
    assert r == 5


def test_functions_and_recursion():
    r, _ = evaluate_python_code("""
def fib(n):
    if n < 2:
        return n
    return fib(n-1) + fib(n-2)
fib(10)
""")
    assert r == 55


def test_lambda_and_comprehensions():
    r, _ = evaluate_python_code("sorted([x*x for x in range(5) if x != 2], key=lambda v: -v)")
    assert r == [16, 9, 1, 0]
    r, _ = evaluate_python_code("{k: v for k, v in [('a', 1), ('b', 2)]}")
    assert r == {"a": 1, "b": 2}


def test_classes():
    r, _ = evaluate_python_code("""
class Point:
    def __init__(self, x, y):
        self.x = x
        self.y = y
    def norm2(self):
        return self.x**2 + self.y**2
Point(3, 4).norm2()
""")
    assert r == 25


def test_fstrings_and_unpacking():
    r, _ = evaluate_python_code("a, b, *rest = [1, 2, 3, 4]\nf'{a}-{b}-{rest!r}'")
    assert r == "1-2-[3, 4]"


def test_try_except():
    r, _ = evaluate_python_code("""
try:
    x = 1 / 0
except ZeroDivisionError as e:
    x = 'caught'
x
""")
    assert r == "caught"


def test_import_allowlist():
    r, _ = evaluate_python_code("import math\nmath.sqrt(16)")
    assert r == 4.0
    with pytest.raises(InterpreterError, match="not allowed"):
        evaluate_python_code("import os")
    with pytest.raises(InterpreterError, match="not allowed"):
        evaluate_python_code("from subprocess import run")


def test_dunder_blocked():
    with pytest.raises(InterpreterError, match="dunder"):
        evaluate_python_code("(1).__class__")
    with pytest.raises(InterpreterError, match="dunder"):
        evaluate_python_code("x = []\nx.__class__.__bases__")


def test_forbidden_builtins():
    with pytest.raises(InterpreterError):
        evaluate_python_code("eval('1+1')")
    with pytest.raises(InterpreterError):
        evaluate_python_code("open('/etc/passwd')")


def test_operation_budget():
    interp = Interpreter(max_operations=1000)
    with pytest.raises(InterpreterError, match="budget"):
        interp.run("for i in range(100000):\n    x = i")


def test_huge_power_guard():
    with pytest.raises(InterpreterError, match="power"):
        evaluate_python_code("10 ** 100000")


def test_final_answer():
    ex = LocalPythonExecutor()
    result, logs, is_final = ex("final_answer(42)")
    assert result == 42 and is_final


def test_numpy_available():
    r, _ = evaluate_python_code("import numpy as np\nfloat(np.mean([1, 2, 3]))")
    assert r == 2.0


# ---------------------------------------------------------------- tool wrapper

def test_ipython_interpreter_tool():
    tool = IPythonInterpreter()
    out, ctx = tool.execute(code="a = 6 * 7\nprint(a)")
    assert "42" in out
    assert ctx["a"] == 42
    out2, ctx2 = tool.execute(code="a + 1")
    assert "43" in out2  # session persists


def test_tool_context_seeding():
    out, ctx = execute_python_code("y = x * 2\nprint(y)", context={"x": 21})
    assert "42" in out
    assert ctx["y"] == 42


def test_tool_error_reported_not_raised():
    out, _ = execute_python_code("1/0")
    assert out.startswith("Error:")


def test_tool_output_truncated():
    out, _ = execute_python_code("print('z' * 10000)")
    assert len(out) <= 512 + len("...<truncated>")


# ---------------------------------------------------------------- RPC server

@pytest.fixture(scope="module")
def tool_server():
    from lapha_tpu.tools import server as srv

    httpd = srv.serve(port=0, background=True)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_server_execute_and_session_persistence(tool_server):
    import requests

    r1 = requests.post(tool_server + "/execute", json={"code": "q = 10\nprint(q)"}).json()
    assert r1["status"] == "success" and "10" in r1["output"]
    sid = r1["session_id"]
    r2 = requests.post(tool_server + "/execute", json={"code": "print(q * 2)", "session_id": sid}).json()
    assert "20" in r2["output"]
    assert r2["session_id"] == sid


def test_server_error_status(tool_server):
    import requests

    r = requests.post(tool_server + "/execute", json={"code": "nope_undefined"}).json()
    assert r["status"] == "error"
    assert "Error" in r["output"]


def test_server_health(tool_server):
    import requests

    assert requests.get(tool_server + "/health").json()["status"] == "ok"


def test_client_via_server(tool_server):
    out, ctx = execute_python_code("w = 5\nprint(w + 1)", server_url=tool_server)
    assert "6" in out
    assert ctx.get("w") == 5


def test_timeout_watchdog_in_worker_thread():
    """Review finding: tool code in server handler threads had no time limit.
    The async-exc watchdog must interrupt a pure-Python infinite loop."""
    import threading

    from lapha_tpu.tools.sandbox import Interpreter

    tool = IPythonInterpreter(time_limit=1)
    tool.interp.max_operations = 10**12  # op budget out of the way
    result = {}

    def run():
        out, _ = tool.execute(code="i = 0\nwhile True:\n    i += 1")
        result["out"] = out

    t = threading.Thread(target=run)
    t.start()
    t.join(timeout=15)
    assert not t.is_alive(), "worker thread hung despite watchdog"
    assert result["out"].startswith("Error:"), result["out"]


def test_server_max_requests_recycles_sessions():
    import requests

    from lapha_tpu.tools import server as srv

    httpd = srv.serve(port=0, background=True, max_requests=2)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        r1 = requests.post(base + "/execute", json={"code": "q = 7"}).json()
        sid = r1["session_id"]
        # 2nd request hits the limit -> all interpreter state recycled
        requests.post(base + "/execute", json={"code": "print(q)", "session_id": sid})
        r3 = requests.post(base + "/execute",
                           json={"code": "print(q)", "session_id": sid}).json()
        assert r3["status"] == "error"  # q is gone: fresh interpreter
        assert "q" not in r3["context"]
    finally:
        httpd.shutdown()


# ------------------------------------------------------- subprocess isolation

def test_subprocess_isolation_basic_and_state():
    t = IPythonInterpreter(time_limit=5, isolation="subprocess")
    out, vars1 = t.execute(code="x = 6 * 7\nprint(x)")
    assert "42" in out
    out2, vars2 = t.execute(code="print(x + 1)")  # state persisted via pickle-back
    assert "43" in out2
    assert vars2["x"] == 42


def test_subprocess_isolation_kills_stuck_c_call():
    """A long C-level call (no bytecode boundaries) cannot be interrupted by
    the in-thread watchdog; the subprocess tier's RLIMIT_CPU kills it."""
    t = IPythonInterpreter(time_limit=2, isolation="subprocess")
    # one C-level call with no bytecode boundaries: math.prod over huge ints
    # (the **-power guard doesn't trigger; the watchdog could never stop it)
    code = "import math\nr = math.prod([10**4000] * 5000)\nprint('done')"
    import time as _time
    t0 = _time.time()
    out, _ = t.execute(code=code)
    took = _time.time() - t0
    assert took < 15, f"hard isolation failed to kill in time ({took:.1f}s)"
    # either the CPU limit killed it or (on fast machines) it finished
    assert "Error" in out or "done" in out


def test_subprocess_isolation_timeout_message():
    t = IPythonInterpreter(time_limit=1, isolation="subprocess")
    out, _ = t.execute(code="i = 0\nwhile True:\n    i += 1")
    assert "Error" in out and "exceeded" in out


def test_server_subprocess_isolation_mode():
    import requests

    from lapha_tpu.tools import server as srv

    httpd = srv.serve(port=0, background=True, isolation="subprocess")
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        r = requests.post(base + "/execute", json={"code": "q = 5\nprint(q*2)"}).json()
        assert r["status"] == "success" and "10" in r["output"]
        r2 = requests.post(base + "/execute",
                           json={"code": "print(q)", "session_id": r["session_id"]}).json()
        assert "5" in r2["output"]
    finally:
        httpd.shutdown()
        srv.ISOLATION = "thread"
