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


class InterpThrow(Exception):
    """A uDLang `throw` in flight: recoverable by an enclosing `attempt`
    (ast.Attempt); fatal (converted to InterpError) if it escapes the
    kernel body — matching the compiled path's raise_error."""

    def __init__(self, message: str):
        super().__init__(message)
        self.message = message


class MapVal(dict):
    """Runtime marker for map-typed dicts. The compiled path is statically
    typed (compile_has branches on TMap vs TRecord); the interp is runtime-
    typed, so map literals carry this subclass to keep `.?.` (key
    containment, map_contains_key semantics: True for a key held with a
    NULL value) distinguishable from record `.?.` (field isNotNull) and
    from the tuple encoding (dict keyed _1.._n). Maps only ever originate
    from ast.MapExpr in the interp subset, so the marker is total."""


def _is_tuple_dict(v: dict, n: int | None = None) -> bool:
    """True when `v` is the interp's tuple encoding: keys exactly _1.._k
    (k = n when given), no _tag."""
    k = n if n is not None else len(v)
    return (
        not isinstance(v, MapVal)
        and len(v) == k
        and all(f"_{i + 1}" in v for i in range(k))
    )


@dataclass
class Closure:
    fn: ast.Lambda
    env: dict  # live reference — lets recursion see its own binding


@dataclass
class Native:
    """Interp-side twin of the compiler's SNative builtins (the named
    function library, SURVEY.md §2.3 ext row) — Python semantics matching
    the Column-compiled versions."""

    name: str
    arity: int
    fn: object  # callable(interp, args, in_value, outs) -> value


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
        env: dict = dict(_NATIVES)
        try:
            for stmt in list(self.program.decls) + list(self.program.body):
                self.exec_stmt(stmt, env, in_value, outs)
        except InterpThrow as t:
            # uncaught throw is fatal for the record, like the compiled
            # raise_error path
            raise InterpError(f"throw: {t.message!r}") from None
        return outs

    # -- closure application --------------------------------------------
    def apply_fn(self, fn, args: list, in_value, outs: list):
        if isinstance(fn, Native):
            if len(args) != fn.arity:
                raise InterpError(f"{fn.name} expects {fn.arity} args")
            # NULL propagation, mirroring the compiled Column builtins
            # (r10 builtins-null fuzz family): least/greatest SKIP NULLs
            # (non-NULL operand wins, NULL only when both are); reduce's
            # NULL init flows into the merge exactly like F.aggregate's;
            # every other builtin is NULL on any NULL argument.
            # Function-valued args (map/filter/reduce lambdas) are never
            # None, so the generic any() check is safe for them.
            if fn.name in ("min", "max"):
                nn = [a for a in args if a is not None]
                if len(nn) < 2:
                    return nn[0] if nn else None
            elif fn.name == "reduce":
                if args[0] is None:
                    return None
            elif any(a is None for a in args):
                return None
            return fn.fn(self, args, in_value, outs)
        if not isinstance(fn, Closure):
            raise InterpError("call of a non-function value")
        params = fn.fn.params
        call_env = dict(fn.env)
        if fn.fn.rest_param is not None:
            if len(args) < len(params):
                raise InterpError("arity mismatch")
            call_env[fn.fn.rest_param[0]] = list(args[len(params) :])
            args = args[: len(params)]
        elif len(args) != len(params):
            raise InterpError("arity mismatch")
        for (name, _t), v in zip(params, args):
            call_env[name] = v
        return self.eval(fn.fn.body, call_env, in_value, outs)

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
        elif isinstance(stmt, ast.Destructure):
            # `let {a, b} = expr;` — mirror compile_stmt: each name binds
            # the record field / map value (Dot semantics)
            val = self.eval(stmt.value, env, in_value, outs)
            if not isinstance(val, dict):
                raise InterpError("destructure of a non-record/map value")
            for name in stmt.names:
                # Mirror Dot / compiled element_at semantics: an absent map
                # key binds NULL (record fields are statically checked, so
                # for records this get() always hits).
                env[name] = val.get(name)
        elif isinstance(stmt, ast.ListIter):
            # mirror compile_list_iter: per element, execute the body for
            # effect with the loop var scoped to the iteration (a fresh
            # env copy per element — body Lets never leak)
            src = self.eval(stmt.source, env, in_value, outs)
            if not isinstance(src, list):
                raise InterpError("for..in over a non-list value")
            for item in src:
                inner = dict(env)
                inner[stmt.var] = item
                self.eval(stmt.body, inner, in_value, outs)
        elif isinstance(stmt, ast.MapIter):
            # mirror compile_map_iter: construction-order entries (Python
            # dicts and Spark map_entries both preserve insertion order)
            src = self.eval(stmt.source, env, in_value, outs)
            if not isinstance(src, dict):
                raise InterpError("for (k, v) over a non-map value")
            for k, item in src.items():
                inner = dict(env)
                inner[stmt.key_var] = k
                inner[stmt.val_var] = item
                self.eval(stmt.body, inner, in_value, outs)
        elif isinstance(stmt, ast.Throw):
            raise InterpThrow(str(self.eval(stmt.value, env, in_value, outs)))
        elif isinstance(stmt, ast.Suppose):
            # subjunctive (reference src/ir.rs:900-924, src/vm.rs:603-638):
            # run the delegate with its outs redirected into a capture
            # buffer; non-empty → run the branch with `...;` replaying the
            # buffer, empty → run the leaf. The explicit outs threading IS
            # the VM's capture stack: a nested suppose in the branch (or
            # the delegate) allocates its own buffer recursively, so the
            # inner `...;` replays the inner captures only.
            caps: list = []
            self.eval(stmt.delegate, env, in_value, caps)
            if caps:
                # the capture list binds LEXICALLY into the branch scope
                # (same rule as the compiler's `branch_env["..."] = cand`):
                # a closure defined inside the branch captures it with its
                # env; a proc defined OUTSIDE the branch does not see it,
                # so a `...;` in such a proc body is rejected on both
                # execution paths instead of silently replaying whatever
                # suppose happens to be dynamically active (r11 ADVICE).
                branch_env = dict(env)
                branch_env["..."] = caps
                self.eval(stmt.branch, branch_env, in_value, outs)
            else:
                self.eval(stmt.leaf, env, in_value, outs)
        elif isinstance(stmt, ast.EffectCapture):
            if "..." not in env:
                raise InterpError("`...;` outside a suppose branch")
            outs.extend(env["..."])
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
        if isinstance(e, ast.Partial):
            # `$` as a term: the comprehension/partial-expression element —
            # mirrors compiler.compile_expr's Partial case (env lookup)
            if "$" in env:
                return env["$"]
            raise InterpError("`$` used outside a partial context")
        if isinstance(e, ast.Lambda):
            return Closure(e, env)
        if isinstance(e, ast.Attempt):
            # transactional: outs emitted by the aborted body are discarded
            mark = len(outs)
            try:
                return self.eval(e.body, env, in_value, outs)
            except InterpThrow as t:
                del outs[mark:]
                fb_env = dict(env)
                if e.bind is not None:
                    fb_env[e.bind] = t.message
                return self.eval(e.fallback, fb_env, in_value, outs)
        if isinstance(e, ast.Call):
            # `$` / `$...` partials desugar to a closure over the current
            # env, mirroring the compiler's compile-time curry — for USER
            # functions only: compile_call's SNative branch never curries
            # (built-ins have fixed arity), it resolves `$` as a term from
            # the enclosing partial context instead, so the interp must
            # evaluate native args directly too (the Partial case above).
            # The callee evaluates first either way, like compile_call.
            fn = self.eval(e.func, env, in_value, outs)
            if not isinstance(fn, Native) and any(
                isinstance(a, (ast.Partial, ast.PartialRest)) for a in e.args
            ):
                fresh: list[tuple[str, ast.Type]] = []
                filled: list[ast.Expr] = []
                rest: tuple[str, ast.Type] | None = None
                for i, a in enumerate(e.args):
                    if isinstance(a, ast.PartialRest):
                        # mirror compile_call's checks exactly: `$...` must
                        # be last and requires the callee to declare a rest
                        # parameter (r11 spread-arity fuzz found the interp
                        # silently accepting both violations)
                        if a is not e.args[-1]:
                            raise InterpError("`$...` must be the final argument")
                        decl = fn.fn if isinstance(fn, Closure) else None
                        if decl is not None and decl.rest_param is None:
                            raise InterpError(
                                "`$...` requires the callee to declare a "
                                "rest parameter (reference README.md:370-373)"
                            )
                        rest = ("__rest", ast.T_ANY)
                        filled.append(ast.Spread(ast.Id("__rest")))
                    elif isinstance(a, ast.Partial):
                        pname = f"__partial_{i}"
                        fresh.append((pname, ast.T_ANY))
                        filled.append(ast.Id(pname))
                    else:
                        filled.append(a)
                lam = ast.Lambda(
                    tuple(fresh),
                    ast.T_ANY,
                    ast.Call(e.func, tuple(filled)),
                    rest_param=rest,
                )
                return Closure(lam, dict(env))
            args = []
            for a in e.args:
                if isinstance(a, ast.Spread):
                    v = self.eval(a.expr, env, in_value, outs)
                    if not isinstance(v, list):
                        raise InterpError("`...` spread of a non-list value")
                    args.extend(v)
                else:
                    args.append(self.eval(a, env, in_value, outs))
            return self.apply_fn(fn, args, in_value, outs)
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
            if a is None:
                return None  # NULL propagation (compiled -col / ~col)
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
            if obj is None or idx is None:
                return None  # compiled element_at/getField NULL propagation
            if (
                isinstance(obj, dict)
                and not isinstance(obj, MapVal)
                and isinstance(idx, int)
                and not isinstance(idx, bool)
            ):
                # tuple encoding (_1.._n): t[k] → getField("_{k+1}") on the
                # compiled path (compile_index TTuple branch)
                key = f"_{idx + 1}"
                if key not in obj:
                    raise InterpError(f"tuple index {idx} out of range")
                return obj[key]
            try:
                return obj[idx]
            except (IndexError, KeyError) as exc:
                raise InterpError(f"index error: {exc}") from exc
        if isinstance(e, ast.Cast):
            return self._cast(self.eval(e.expr, env, in_value, outs), e.type)
        if isinstance(e, ast.Match):
            return self._match(e, env, in_value, outs)
        if isinstance(e, ast.MapExpr):
            return MapVal(
                (k, self.eval(v, env, in_value, outs)) for k, v in e.items
            )
        if isinstance(e, ast.TupleExpr):
            # the compiled encoding: struct fields _1.._n (types.to_spark);
            # a dict keeps Dot("_k") access uniform with records/maps
            return {
                f"_{i + 1}": self.eval(x, env, in_value, outs)
                for i, x in enumerate(e.items)
            }
        if isinstance(e, ast.Dot):
            obj = self.eval(e.obj, env, in_value, outs)
            if obj is None:
                # NULL object (e.g. a missing nested map key upstream):
                # compiled element_at/getField on a NULL column is NULL
                return None
            if isinstance(obj, dict):
                # records always carry the field in a type-checked program;
                # maps return NULL for absent keys (element_at semantics)
                return obj.get(e.name)
            raise InterpError(
                f".{e.name} on a non-record/map value in interp fallback "
                "(module members and method builtins are compile-time only)"
            )
        if isinstance(e, ast.Has):
            obj = self.eval(e.obj, env, in_value, outs)
            if obj is None:
                # compiled map_contains_key/isNotNull over a NULL object is
                # NULL/false, and `if (NULL)` takes the else branch — the
                # observable value of `x.?.f` on NULL x is False
                return False
            if isinstance(obj, MapVal):
                # map: key containment (map_contains_key, compiler.py
                # compile_has) — True even when the held value is NULL
                return e.name in obj
            if isinstance(obj, dict):
                # record: field present but NULL → False (isNotNull)
                return obj.get(e.name) is not None
            raise InterpError(".?. on a non-record/map value")
        if isinstance(e, ast.Comprehension):
            seq = self.eval(e.seq, env, in_value, outs)
            if not isinstance(seq, list):
                raise InterpError("comprehension over a non-list value")
            # mirror compile_comprehension's three fn forms: a lambda, a
            # bound function value, or ANY other expression as an implicit
            # one-param `$`-lambda (`[xs | $ + 3]`)
            fnexpr = e.fn
            if isinstance(fnexpr, ast.Lambda):
                fn = Closure(fnexpr, dict(env))
            elif isinstance(fnexpr, ast.Id) and isinstance(
                # Closure only — compile_comprehension's bound-function form
                # accepts SFunc but NOT builtins (an SNative id falls to the
                # implicit-$ branch and fails as_col there); mirror that so
                # `[xs | someBuiltin]` errors identically on both paths.
                env.get(fnexpr.name),
                Closure,
            ):
                fn = env[fnexpr.name]
            else:
                fn = Closure(
                    ast.Lambda((("$", ast.T_ANY),), ast.T_ANY, fnexpr),
                    dict(env),
                )
            mapped = [self.apply_fn(fn, [x], in_value, outs) for x in seq]
            # mirror as_col's escape check: the compiled implicit-$ branch
            # raises "function value escapes to runtime" when the element
            # expression is itself a function (e.g. `[xs | someBuiltin]`)
            if any(isinstance(m, (Closure, Native)) for m in mapped):
                raise InterpError("function value escapes to runtime")
            return mapped
        raise InterpError(f"unsupported expression in interp fallback: {type(e).__name__}")

    def _match(self, e: ast.Match, env, in_value, outs):
        """Mirror compiler.compile_match arm-for-arm: literal patterns are
        equality tests with cross-type-False (bool never equals a number —
        unify raises — while Int/Float compare numerically), `None` is a
        null test, an untyped bind always matches, and a typed bind matches
        a tagged-struct subject by `_tag` (binding the variant branch) or a
        plain subject by exact runtime type. No arm matched = InterpError,
        the compiled path's poison."""
        from udlang_spark.kernel.types import (
            KernelTypeError,
            python_type_of,
            type_tag,
            unify,
        )

        subj = self.eval(e.subject, env, in_value, outs)
        for arm in e.arms:
            pat = arm.pattern
            if isinstance(pat, ast.PLit):
                try:
                    unify(python_type_of(subj), python_type_of(pat.value))
                except KernelTypeError:
                    continue  # cross-type (or null-subject) equality: false
                if subj == pat.value:
                    return self.eval(arm.body, env, in_value, outs)
                continue
            if isinstance(pat, ast.PNone):
                if subj is None:
                    return self.eval(arm.body, env, in_value, outs)
                continue
            if isinstance(pat, ast.PBind):
                if pat.type is None:
                    env2 = dict(env)
                    env2[pat.name] = subj
                    return self.eval(arm.body, env2, in_value, outs)
                # resolve typedef aliases / value types exactly like the
                # compiler does — an unresolved TName would never tag-match
                # (and type_tag would raise); found by review of the fuzz
                pt = self._resolve_type(pat.type)
                if isinstance(subj, dict) and "_tag" in subj:
                    if subj["_tag"] != type_tag(pt):
                        continue
                    val = next(
                        (
                            v
                            for k, v in subj.items()
                            if k != "_tag" and v is not None
                        ),
                        None,
                    )
                    env2 = dict(env)
                    env2[pat.name] = val
                    return self.eval(arm.body, env2, in_value, outs)
                if self._runtime_matches(subj, pt):
                    env2 = dict(env)
                    env2[pat.name] = subj
                    return self.eval(arm.body, env2, in_value, outs)
                continue
            raise InterpError(f"unsupported pattern {pat!r}")
        raise InterpError("match: no case matched")

    def _resolve_type(self, t: ast.Type) -> ast.Type:
        """The compiler's resolve_type, re-expressed over the program's
        TypeDef decls: alias names, the numeric tower, value types, and
        recursive containers — so typed binds see the same resolved type on
        both execution paths."""
        from udlang_spark.kernel.types import (
            NUMERIC_ALIASES,
            python_type_of,
        )

        if isinstance(t, ast.TCons):
            from udlang_spark.kernel.types import (
                KernelTypeError,
                apply_type_cons,
            )

            cons = t.cons
            td = (
                self._typedefs().get(cons.name)
                if isinstance(cons, ast.TName)
                else None
            )
            if not isinstance(td, ast.TFunc):
                raise InterpError(f"cannot apply non-constructor type {cons!r}")
            try:
                return self._resolve_type(apply_type_cons(td, cons.name, t.args))
            except KernelTypeError as e:
                raise InterpError(str(e)) from None
        if isinstance(t, ast.TName):
            td = self._typedefs().get(t.name)
            if td is not None:
                if isinstance(td, ast.TFunc):
                    raise InterpError(
                        f"type constructor {t.name} used without arguments"
                    )
                return self._resolve_type(td)
            if t.name in NUMERIC_ALIASES:
                from udlang_spark.kernel.types import collapse_sized

                # sized views match as Int (compiler.compile_match collapses
                # pattern types identically)
                return collapse_sized(NUMERIC_ALIASES[t.name])
            raise InterpError(f"unknown type name {t.name}")
        if isinstance(t, ast.TValue):
            return python_type_of(t.value)
        if isinstance(t, ast.TOption):
            return ast.TOption(self._resolve_type(t.inner))
        if isinstance(t, ast.TList):
            return ast.TList(self._resolve_type(t.item))
        if isinstance(t, ast.TMap):
            return ast.TMap(self._resolve_type(t.value))
        if isinstance(t, ast.TTuple):
            return ast.TTuple(tuple(self._resolve_type(i) for i in t.items))
        if isinstance(t, ast.TUnion):
            variants: list[ast.Type] = []
            for v in t.variants:
                rv = self._resolve_type(v)
                if rv not in variants:
                    variants.append(rv)
            if len(variants) == 1:
                return variants[0]
            return ast.TUnion(tuple(variants))
        return t

    def _typedefs(self) -> dict:
        cached = getattr(self, "_typedef_cache", None)
        if cached is None:
            cached = {}
            for d in self.program.decls:
                decl = d.decl if isinstance(d, ast.Export) else d
                if isinstance(decl, ast.TypeDef):
                    cached[decl.name] = decl.type
            self._typedef_cache = cached
        return cached

    @staticmethod
    def _runtime_matches(subj, pt: ast.Type) -> bool:
        """Structural runtime check for typed binds over PLAIN (non-tagged)
        subjects — the interp's stand-in for the compiler's static
        `inner == pt` test: scalars by exact runtime type (Int never
        matches a Float bind), containers by shape. Non-scalar subjects
        previously raised inside python_type_of and silently skipped the
        arm (review finding)."""
        from udlang_spark.kernel.types import KernelTypeError, python_type_of

        if isinstance(pt, ast.TOption):
            return subj is None or Interp._runtime_matches(subj, pt.inner)
        if subj is None:
            return False
        if isinstance(pt, ast.TList):
            return isinstance(subj, list)
        if isinstance(pt, ast.TMap):
            # maps carry the MapVal marker — a tuple-dict (_1.._n) or a
            # record must NOT satisfy a map bind (compiled path: static
            # inner == pt fails)
            return isinstance(subj, MapVal)
        if isinstance(pt, ast.TRecord):
            if not isinstance(subj, dict) or isinstance(subj, MapVal):
                return False
            if "_tag" in subj:
                return False
            return set(subj) == {f.name for f in pt.fields}
        if isinstance(pt, ast.TTuple):
            # interp tuples are dicts keyed _1.._n (TupleExpr eval above),
            # matching the compiled struct encoding — never list/tuple
            return isinstance(subj, dict) and _is_tuple_dict(
                subj, len(pt.items)
            )
        try:
            return python_type_of(subj) == pt
        except KernelTypeError:
            return False

    # -- reference operator semantics (src/ir.rs:429-696) ---------------
    @staticmethod
    def _trunc_div(a: int, b: int) -> int:
        q = a // b
        if a % b != 0 and (a < 0) != (b < 0):
            q += 1
        return q

    def _bin(self, op: str, a, b):
        if a is None or b is None:
            # NULL propagation mirroring the compiled Column semantics (and
            # compiler.fold_bin's None branch): arithmetic/comparison with
            # NULL is NULL; and/or are Kleene, so a deciding operand decides
            if op == "and" and (a is False or b is False):
                return False
            if op == "or" and (a is True or b is True):
                return True
            return None
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
        from udlang_spark.kernel.types import SIZED_INTS

        if v is None:
            return None  # compiled Column.cast propagates NULL
        if isinstance(t, ast.TName) and t.name in SIZED_INTS:
            t = ast.TPrim(t.name)
        if isinstance(t, ast.TPrim) and t.name in SIZED_INTS:
            # range-checked sized view (compiler sized_range_check twin):
            # value stays an i64-domain int; out-of-range raises
            _s, lo, hi = SIZED_INTS[t.name]
            x = int(v)
            if not (lo <= x <= min(hi, 2**63 - 1)):
                raise InterpError(f"value out of range for {t.name}: {x}")
            return x
        if t is ast.T_INT:
            return int(v)  # Float→Int truncates, matching the compiled path
        if t is ast.T_FLOAT:
            return float(v)
        if t is ast.T_BOOL:
            return bool(v)
        if t is ast.T_STR and isinstance(v, str):
            return v
        raise InterpError(f"unsupported cast target {t!r}")


def _nat(name, arity):
    def deco(f):
        return Native(name, arity, f)

    return deco


def _num2(pyfn):
    def f(it, args, in_value, outs):
        a, b = args
        return pyfn(a, b)

    return f


def _math1(pyfn):
    def f(it, args, in_value, outs):
        return pyfn(float(args[0]))

    return f


def _interp_natives() -> dict:
    import math

    def length(it, args, in_value, outs):
        v = args[0]
        if isinstance(v, (str, list, dict)):
            return len(v)
        raise InterpError(f"length on {type(v).__name__}")

    def join(it, args, in_value, outs):
        xs, sep = args
        return sep.join(str(x) for x in xs)

    def split(it, args, in_value, outs):
        s, sep = args
        return s.split(sep)

    def replace(it, args, in_value, outs):
        s, old, new = args
        return s.replace(old, new)

    def substr(it, args, in_value, outs):
        s, start, n = args
        return s[start : start + n]  # 0-based, matching the compiled path

    def contains(it, args, in_value, outs):
        hay, needle = args
        return needle in hay

    def map_(it, args, in_value, outs):
        xs, fn = args
        return [it.apply_fn(fn, [x], in_value, outs) for x in xs]

    def filter_(it, args, in_value, outs):
        xs, fn = args
        return [x for x in xs if it.apply_fn(fn, [x], in_value, outs)]

    def reduce_(it, args, in_value, outs):
        xs, acc, fn = args
        for x in xs:
            acc = it.apply_fn(fn, [acc, x], in_value, outs)
        return acc

    def floor_(it, args, in_value, outs):
        return math.floor(args[0])

    def ceil_(it, args, in_value, outs):
        return math.ceil(args[0])

    specs = {
        "min": Native("min", 2, _num2(min)),
        "max": Native("max", 2, _num2(max)),
        "abs": Native("abs", 1, Native, ),
    }
    # abs needs its own wrapper (placeholder above replaced here)
    specs["abs"] = Native("abs", 1, lambda it, a, iv, o: abs(a[0]))
    specs["shl"] = Native("shl", 2, lambda it, a, iv, o: a[0] << a[1])
    specs["shr"] = Native("shr", 2, lambda it, a, iv, o: a[0] >> a[1])
    for name, fn in (
        ("sqrt", math.sqrt), ("cos", math.cos), ("sin", math.sin),
        ("tan", math.tan), ("log", math.log), ("exp", math.exp),
    ):
        specs[name] = Native(name, 1, _math1(fn))
    specs["floor"] = Native("floor", 1, floor_)
    specs["ceil"] = Native("ceil", 1, ceil_)
    specs["length"] = Native("length", 1, length)
    specs["join"] = Native("join", 2, join)
    specs["split"] = Native("split", 2, split)
    specs["upper"] = Native("upper", 1, lambda it, a, iv, o: a[0].upper())
    specs["lower"] = Native("lower", 1, lambda it, a, iv, o: a[0].lower())
    specs["trim"] = Native("trim", 1, lambda it, a, iv, o: a[0].strip())
    specs["replace"] = Native("replace", 3, replace)
    specs["substr"] = Native("substr", 3, substr)
    specs["contains"] = Native("contains", 2, contains)
    specs["map"] = Native("map", 2, map_)
    specs["filter"] = Native("filter", 2, filter_)
    specs["reduce"] = Native("reduce", 3, reduce_)
    return specs


_NATIVES = _interp_natives()
