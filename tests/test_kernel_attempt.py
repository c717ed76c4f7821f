"""Recoverable exceptions (`attempt … recover …`, ast.Attempt) — an
EXTENSION: the reference defers exceptions (README.md:97, :399). Covers the
compiled when()-machinery path and the interp fallback, including the
transactional-outs rule and the first-throw-wins message."""

from __future__ import annotations

import pytest

from udlang_spark.kernel.api import compile_kernel
from udlang_spark.kernel.compiler import KernelCompileError

HDR = 'version 0.1-pre_mvp;\nscript "t";\n'


def _run(spark, src: str, values: list[int]) -> list:
    k = compile_kernel(HDR + src)
    df = spark.createDataFrame([(v,) for v in values], "v long")
    return [r[0] for r in k.apply(df, input_col="v").orderBy("out").collect()]


def test_attempt_recovers_with_message(spark):
    src = """
input Int;
output Int;
func risky(n: Int) -> Int {
  if (n % 3 == 0) {
    throw "divisible";
  }
  n * 10
}
out attempt risky(in) recover (m) 0 - length(m);
"""
    got = _run(spark, src, [1, 2, 3, 4, 5, 6])
    assert got == sorted([10, 20, -9, 40, 50, -9])


def test_attempt_without_bind(spark):
    src = """
input Int;
output Int;
out attempt (if (in > 2) { throw "big"; 0 } else { in }) recover 99;
"""
    # if-expr whose then-branch throws; else passes through
    got = _run(spark, src, [1, 2, 3])
    assert got == [1, 2, 99]


def test_first_throw_wins(spark):
    src = """
input Int;
output Int;
func risky(n: Int) -> Int {
  if (n % 2 == 0) {
    throw "even";
  }
  if (n > 3) {
    throw "big";
  }
  n
}
out attempt risky(in) recover (m) 0 - length(m);
"""
    # 4 satisfies both guards: program order says "even" (-4), not "big" (-3)
    got = {v: o for v, o in zip([4], _run(spark, "".join(src), [4]))}
    assert got[4] == -4
    assert _run(spark, src, [5]) == [-3]
    assert _run(spark, src, [3]) == [3]


def test_attempt_discards_body_outs(spark):
    """Transactional: `out`s emitted before the throw are discarded for
    thrown rows (same capture discipline as `suppose`)."""
    src = """
input Int;
output Int;
let r = attempt {
  out in * 100;
  if (in % 2 == 0) {
    throw "even";
  }
  in
} recover 0 - 1;
out r;
"""
    sdf = spark.createDataFrame([(1,), (2,)], "v long")
    rows = sorted(
        r[0] for r in compile_kernel(HDR + src).apply(sdf, input_col="v").collect()
    )
    # v=1: out 100, out 1.  v=2: thrown -> ONLY the fallback out (-1)
    assert rows == [-1, 1, 100]


def test_nested_attempt_and_fallback_rethrow(spark):
    """A throw in the fallback propagates to the enclosing attempt."""
    src = """
input Int;
output Int;
let r = attempt (
    attempt (if (in % 2 == 0) { throw "inner"; 0 } else { in })
    recover (m) { throw "outer"; 0 }
  ) recover (m2) length(m2) * 100;
out r;
"""
    got = _run(spark, src, [1, 2])
    assert got == sorted([1, 500])  # "outer" has length 5


def test_uncaught_throw_still_fatal(spark):
    src = """
input Int;
output Int;
if (in > 1) {
  throw "boom";
}
out in;
"""
    k = compile_kernel(HDR + src)
    sdf = spark.createDataFrame([(2,)], "v long")
    with pytest.raises(Exception, match="boom"):
        k.apply(sdf, input_col="v").collect()


def test_throw_in_runtime_loop_is_compile_error(spark):
    src = """
input Str;
output Int;
let r = attempt {
  for x in split(in, " ") {
    if (x == "bad") {
      throw "elem";
    }
  }
  1
} recover 0;
out r;
"""
    k = compile_kernel(HDR + src)  # compilation is lazy — happens in apply
    sdf = spark.createDataFrame([("a bad c",)], "v string")
    with pytest.raises(KernelCompileError, match="runtime for/comprehension"):
        k.apply(sdf, input_col="v")


def test_attempt_interp_parity(spark):
    """The mapInPandas AST-interpreter fallback implements identical
    semantics (message binding, transactional outs, nesting)."""
    src = """
input Int;
output Int;
func risky(n: Int) -> Int {
  if (n % 3 == 0) {
    throw "divisible";
  }
  n * 10
}
out attempt risky(in) recover (m) 0 - length(m);
"""
    k = compile_kernel(HDR + src)
    sdf = spark.createDataFrame([(v,) for v in range(1, 7)], "v long")
    compiled = sorted(r[0] for r in k.apply(sdf, input_col="v").collect())
    interp = sorted(
        r[0] for r in k.apply(sdf, input_col="v", recursion="interp").collect()
    )
    assert compiled == interp == sorted([10, 20, -9, 40, 50, -9])


def test_attempt_match_arm_throw(spark):
    src = """
input Int;
output Int;
let r = attempt (match in {
  case 1: 100;
  case 2: { throw "two"; 0 };
  case n: n;
}) recover (m) 0 - length(m);
out r;
"""
    got = _run(spark, src, [1, 2, 3])
    assert got == sorted([100, -3, 3])
