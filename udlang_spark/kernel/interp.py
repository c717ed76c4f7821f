"""Per-row AST interpreter — the recursion fallback of SURVEY.md §2.10.

The kernel compiler inlines and unrolls recursion into Column expressions
up to `max_depth` (with a poison guard beyond); that covers the common
case with zero Python in the hot path. For genuinely unbounded recursion
(the reference VM recurses natively to any depth — src/vm.rs:561-580),
`Kernel.apply(recursion="interp")` runs THIS interpreter inside an
Arrow-batched mapInPandas stage instead: reference semantics at any
depth, at Python speed — the documented slow path, chosen per-kernel,
never silently.

Semantics follow the reference's operator table (src/ir.rs:429-696):
truncated integer division/modulo (Rust `/`/`%` on i64 — NOT Python's
floored `//`), `+` on strings = concat, non-short-circuit logic, deep
`==` with cross-type False, `!` pass-through. Unsupported constructs
raise InterpError naming the node — never silently diverge from the
compiled path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from udlang_spark.kernel import ast

VOID = object()  # a proc's "value": never emitted by `out`


class InterpError(Exception):
    pass


@dataclass
class Closure:
    fn: ast.Lambda
    env: dict  # live reference — lets recursion see its own binding


class Interp:
    def __init__(self, program: ast.Program, max_steps: int = 5_000_000):
        if program.kind != "script":
            raise InterpError("only scripts are executable")
        self.program = program
        self.max_steps = max_steps
        self._steps = 0

    def run(self, in_value) -> list:
        """Execute decls + body for one input record; returns outputs."""
        import sys

        # ~7 Python frames per kernel-level recursion; CPython 3.11 heap-
        # allocates pure-Python frames, so a high limit is safe here. The
        # real guard is max_steps below.
        if sys.getrecursionlimit() < 200_000:
            sys.setrecursionlimit(200_000)
        self._steps = 0
        outs: list = []
        env: dict = {}
        for stmt in list(self.program.decls) + list(self.program.body):
            self.exec_stmt(stmt, env, in_value, outs)
        return outs

    # -- statements ------------------------------------------------------
    def exec_stmt(self, stmt, env: dict, in_value, outs: list) -> None:
        if isinstance(stmt, ast.Let):
            env[stmt.name] = self.eval(stmt.value, env, in_value, outs)
        elif isinstance(stmt, ast.Out):
            v = self.eval(stmt.value, env, in_value, outs)
            # `out <void>` emits NULL — faithful to the VM pushing None
            # (matches the compiled path; see tests/test_kernel_examples.py
            # test_count)
            outs.append(None if v is VOID else v)
        elif isinstance(stmt, ast.ExprStmt):
            self.eval(stmt.expr, env, in_value, outs)
        elif isinstance(stmt, ast.TypeDef):
            pass
        elif isinstance(stmt, ast.Throw):
            raise InterpError(f"throw: {self.eval(stmt.value, env, in_value, outs)!r}")
        else:
            raise InterpError(f"unsupported statement in interp fallback: {type(stmt).__name__}")

    # -- expressions -----------------------------------------------------
    def eval(self, e, env: dict, in_value, outs: list):
        self._steps += 1
        if self._steps > self.max_steps:
            raise InterpError("interp step budget exceeded (runaway recursion?)")
        if isinstance(e, ast.Lit):
            return e.value
        if isinstance(e, ast.In):
            return in_value
        if isinstance(e, ast.Id):
            if e.name not in env:
                raise InterpError(f"unbound identifier {e.name!r}")
            return env[e.name]
        if isinstance(e, ast.Lambda):
            return Closure(e, env)
        if isinstance(e, ast.Call):
            fn = self.eval(e.func, env, in_value, outs)
            if not isinstance(fn, Closure):
                raise InterpError("call of a non-function value")
            if len(e.args) != len(fn.fn.params):
                raise InterpError("arity mismatch")
            call_env = dict(fn.env)
            for (name, _t), arg in zip(fn.fn.params, e.args):
                call_env[name] = self.eval(arg, env, in_value, outs)
            return self.eval(fn.fn.body, call_env, in_value, outs)
        if isinstance(e, ast.Block):
            inner = dict(env)
            for s in e.stmts:
                self.exec_stmt(s, inner, in_value, outs)
            if e.ret is None:
                return VOID
            return self.eval(e.ret, inner, in_value, outs)
        if isinstance(e, ast.Cond):
            for pred, body in e.clauses:
                p = self.eval(pred, env, in_value, outs)
                if not isinstance(p, bool):
                    raise InterpError("condition must be Bool")
                if p:
                    return self.eval(body, env, in_value, outs)
            if e.default is not None:
                return self.eval(e.default, env, in_value, outs)
            return VOID
        if isinstance(e, ast.Bin):
            return self._bin(e.op, self.eval(e.a, env, in_value, outs),
                             self.eval(e.b, env, in_value, outs))
        if isinstance(e, ast.Un):
            a = self.eval(e.a, env, in_value, outs)
            if e.op == "!":
                return a  # debug tap: pass-through
            if e.op == "-":
                return -a
            if e.op == "not":
                return (not a) if isinstance(a, bool) else ~a
            raise InterpError(f"unsupported unary {e.op!r}")
        if isinstance(e, ast.ListExpr):
            return [self.eval(x, env, in_value, outs) for x in e.items]
        if isinstance(e, ast.Index):
            obj = self.eval(e.obj, env, in_value, outs)
            idx = self.eval(e.index, env, in_value, outs)
            try:
                return obj[idx]
            except (IndexError, KeyError) as exc:
                raise InterpError(f"index error: {exc}") from exc
        if isinstance(e, ast.Cast):
            return self._cast(self.eval(e.expr, env, in_value, outs), e.type)
        raise InterpError(f"unsupported expression in interp fallback: {type(e).__name__}")

    # -- reference operator semantics (src/ir.rs:429-696) ---------------
    @staticmethod
    def _trunc_div(a: int, b: int) -> int:
        q = a // b
        if a % b != 0 and (a < 0) != (b < 0):
            q += 1
        return q

    def _bin(self, op: str, a, b):
        both_int = isinstance(a, int) and isinstance(b, int) and not (
            isinstance(a, bool) or isinstance(b, bool)
        )
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                if not (isinstance(a, str) and isinstance(b, str)):
                    raise InterpError("`+` mixes Str and non-Str")
                return a + b
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            if both_int:
                if b == 0:
                    raise InterpError("integer division by zero")
                return self._trunc_div(a, b)
            return a / b
        if op == "%":
            if both_int:
                if b == 0:
                    raise InterpError("integer modulo by zero")
                return a - self._trunc_div(a, b) * b
            return math.fmod(a, b)
        if op == "^":
            if both_int:
                if b < 0:
                    raise InterpError("Int^negative (reference casts exponent u32)")
                return a**b
            return float(a) ** float(b)
        if op in ("and", "or", "xor"):
            if isinstance(a, bool) and isinstance(b, bool):
                return {"and": a and b, "or": a or b, "xor": a != b}[op]
            return {"and": a & b, "or": a | b, "xor": a ^ b}[op]
        if op in ("<", ">", "<=", ">="):
            return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
        if op == "==":
            if type(a) is not type(b) and not (
                isinstance(a, (int, float)) and isinstance(b, (int, float))
                and not isinstance(a, bool) and not isinstance(b, bool)
            ):
                return False
            return a == b
        raise InterpError(f"unsupported operator {op!r}")

    @staticmethod
    def _cast(v, t: ast.Type):
        if t is ast.T_INT:
            return int(v)  # Float→Int truncates, matching the compiled path
        if t is ast.T_FLOAT:
            return float(v)
        if t is ast.T_BOOL:
            return bool(v)
        if t is ast.T_STR and isinstance(v, str):
            return v
        raise InterpError(f"unsupported cast target {t!r}")
