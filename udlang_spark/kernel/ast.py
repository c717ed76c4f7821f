"""AST for the uDLang kernel language.

Node surface mirrors the reference's AST (reference: src/ast.rs:126-309 —
expressions at :226-240, statements at :243-260, types at :167-206), but is a
fresh Python dataclass design; it is the input to the analysis pass
(kernel/types.py) and the Column compiler (kernel/compiler.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# --------------------------------------------------------------------------
# Types (reference src/ast.rs:167-206)
# --------------------------------------------------------------------------
class Type:
    pass


@dataclass(frozen=True)
class TPrim(Type):
    name: str  # Void | None | Bool | Int | Float | Str | Point | Any | Self

    def __repr__(self) -> str:
        return self.name


T_VOID = TPrim("Void")
T_BOOL = TPrim("Bool")
T_INT = TPrim("Int")
T_FLOAT = TPrim("Float")
T_STR = TPrim("Str")
T_POINT = TPrim("Point")
T_ANY = TPrim("Any")
T_SELF = TPrim("Self")


@dataclass(frozen=True)
class TOption(Type):
    inner: Type


@dataclass(frozen=True)
class TList(Type):
    item: Type


@dataclass(frozen=True)
class TMap(Type):
    value: Type  # keys are always Str (reference src/grammar.lalrpop:142)


@dataclass(frozen=True)
class TTuple(Type):
    items: tuple[Type, ...]


@dataclass(frozen=True)
class TRecordField:
    name: str
    type: Type
    optional: bool = False  # `field?` — may be absent (reference README.md:221-228)


@dataclass(frozen=True)
class TRecord(Type):
    fields: tuple[TRecordField, ...]
    # methods/consts/statics compile away (SURVEY.md §2.10)
    methods: tuple = ()


@dataclass(frozen=True)
class TUnion(Type):
    variants: tuple[Type, ...]


@dataclass(frozen=True)
class TName(Type):
    name: str  # alias, resolved during analysis


@dataclass(frozen=True)
class TLambda(Type):
    """Function type `(x: T, ...) -> R`. The reference AST has
    TypeTag::Lambda (src/ast.rs:199) but no grammar production for it;
    examples/scopes.us:23 uses the syntax, so we support it."""

    params: tuple[Type, ...]
    ret: Type


@dataclass(frozen=True)
class TCons(Type):
    """Type-constructor APPLICATION, `Box<Int>` (reference src/ast.rs:203;
    grammar src/grammar.lalrpop:123-127). The reference parses this and
    stops (roadmap.md defers); here it LOWERS by monomorphizing
    substitution against a TFunc typedef (types.substitute_type)."""

    cons: Type
    args: tuple[Type, ...]


@dataclass(frozen=True)
class TFunc(Type):
    """Type-constructor DEFINITION, `type Box<T>: ...;` (reference
    src/ast.rs:205 TypeFunc(Seq<String>, TypeNode) — AST-only there, no
    grammar rule; our parser accepts the natural `<params>` syntax
    mirroring the application form). Engine extension beyond the
    reference's parse-only status."""

    params: tuple[str, ...]
    body: Type


@dataclass(frozen=True)
class TValue(Type):
    """Literal/value type, e.g. `input "Hello" | "Goodnight"`
    (reference manual.md:97, README.md:129). Lowers to the underlying
    primitive; the value constraint is a match/validation concern."""

    value: object  # str | int | float | bool


# --------------------------------------------------------------------------
# Expressions (reference src/ast.rs:226-240)
# --------------------------------------------------------------------------
class Expr:
    pass


@dataclass(frozen=True)
class Lit(Expr):
    value: object  # int | float | str | bool


@dataclass(frozen=True)
class Id(Expr):
    name: str


@dataclass(frozen=True)
class In(Expr):
    pass


@dataclass(frozen=True)
class SelfExpr(Expr):
    pass


@dataclass(frozen=True)
class Partial(Expr):
    """`$` placeholder for partial application (reference src/ast.rs:231)."""


@dataclass(frozen=True)
class PartialRest(Expr):
    """`$...` rest placeholder in partial application: captures and
    forwards the trailing variadic arguments (reference README.md:370-373,
    'each $ is a distinct argument. $... captures and spreads "rest"
    arguments'). Only valid when the callee's final parameter is a rest
    parameter."""


@dataclass(frozen=True)
class Spread(Expr):
    """`...xs` in a call argument list (reference README.md:260-261,
    'uDLang supports JS-like spread syntax in function calls'). Splices a
    list's elements as individual arguments."""

    expr: Expr


@dataclass(frozen=True)
class ListExpr(Expr):
    items: tuple[Expr, ...]


@dataclass(frozen=True)
class MapExpr(Expr):
    items: tuple[tuple[str, Expr], ...]  # map OR record literal, context-typed


@dataclass(frozen=True)
class TupleExpr(Expr):
    """`(a, b, …)` — fixed-length heterogeneous tuple literal (the form the
    reference's match example returns, manual.md:128-130)."""

    items: tuple[Expr, ...]


@dataclass(frozen=True)
class Bin(Expr):
    op: str  # + - * / ^ and or xor < > <= >= ==
    a: Expr
    b: Expr


@dataclass(frozen=True)
class Un(Expr):
    op: str  # - not
    a: Expr


@dataclass(frozen=True)
class Call(Expr):
    func: Expr
    args: tuple[Expr, ...]


@dataclass(frozen=True)
class Dot(Expr):
    obj: Expr
    name: str


@dataclass(frozen=True)
class Has(Expr):
    """`x.?.f` presence test (reference src/ast.rs:236)."""

    obj: Expr
    name: str


@dataclass(frozen=True)
class Index(Expr):
    obj: Expr
    index: Expr


@dataclass(frozen=True)
class Cond(Expr):
    """if/elif/else chain; used in both expr and stmt position."""

    clauses: tuple[tuple[Expr, Expr], ...]
    default: Expr | None


@dataclass(frozen=True)
class Block(Expr):
    stmts: tuple["Stmt", ...]
    ret: Expr | None  # None == void trailing (`done` / statement block)


@dataclass(frozen=True)
class Lambda(Expr):
    params: tuple[tuple[str, Type], ...]
    ret: Type
    body: Expr
    # `...name: T` rest parameter (reference README.md:335-336): name plus
    # the per-ELEMENT type (the bound value is a list of that type). Always
    # the final parameter when present.
    rest_param: tuple[str, Type] | None = None


@dataclass(frozen=True)
class Cast(Expr):
    """`expr as Type` (reference manual.md:121; IR Coerce src/ir.rs:205)."""

    expr: Expr
    type: Type


class Pattern:
    pass


@dataclass(frozen=True)
class PLit(Pattern):
    """`case "Hello":` — literal equality pattern."""

    value: object


@dataclass(frozen=True)
class PNone(Pattern):
    """`case None:` — null/absent option pattern (reference README.md:236)."""


@dataclass(frozen=True)
class PBind(Pattern):
    """`case s:Float:` (typed narrowing bind) or bare `case p:` catch-all
    bind (reference manual.md:124-132)."""

    name: str
    type: Type | None


@dataclass(frozen=True)
class MatchArm:
    pattern: Pattern
    body: Expr


@dataclass(frozen=True)
class Match(Expr):
    """`match subject { case pat: expr; ... }` (reference manual.md:124-132,
    README.md:124-138 — documented, no grammar rule in the reference;
    SURVEY.md §2.11 puts it in our target surface). Lowers to a when-chain
    over literal equality / union-tag tests."""

    subject: Expr
    arms: tuple[MatchArm, ...]


@dataclass(frozen=True)
class Comprehension(Expr):
    """`[xs | f]` — map f over xs (reference README.md:171-177). f is a
    lambda, a `$`-partial expression, or a bound function value; lowers to
    `transform(xs, λ)`."""

    seq: Expr
    fn: Expr


# --------------------------------------------------------------------------
# Statements (reference src/ast.rs:243-260)
# --------------------------------------------------------------------------
class Stmt:
    pass


@dataclass(frozen=True)
class Let(Stmt):
    name: str
    value: Expr


@dataclass(frozen=True)
class TypeDef(Stmt):
    name: str
    type: Type


@dataclass(frozen=True)
class Out(Stmt):
    value: Expr


@dataclass(frozen=True)
class Destructure(Stmt):
    """`let {a, b} = expr;` — binds each named field (reference
    README.md:351, documented only)."""

    names: tuple[str, ...]
    value: Expr


@dataclass(frozen=True)
class Throw(Stmt):
    """`throw expr;` — user exception (reference README.md:337-341;
    exceptions TBD at README.md:97). Lowers to raise_error: fatal for the
    rows whose control flow reaches it — unless an enclosing `attempt`
    recovers it (see Attempt)."""

    value: Expr


@dataclass(frozen=True)
class Attempt(Expr):
    """`attempt <body> recover [(name)] <fallback>` — recoverable
    exceptions. EXTENSION: the reference declares exceptions a future core
    feature with no semantics yet (README.md:97, :399); this is our design.
    Per record: if evaluating `body` reaches a `throw`, the expression
    yields `fallback` instead (with the thrown message bound to `name`
    when given), and any `out` effects from the aborted body are discarded
    (transactional, matching `suppose`'s capture discipline). Throws in
    `fallback` propagate to the next enclosing attempt, or are fatal."""

    body: Expr
    bind: str | None
    fallback: Expr


@dataclass(frozen=True)
class ExprStmt(Stmt):
    """Expression evaluated for effect (bare call / block / if-stmt)."""

    expr: Expr


@dataclass(frozen=True)
class ListIter(Stmt):
    var: str
    source: Expr
    body: Expr  # Block


@dataclass(frozen=True)
class MapIter(Stmt):
    key_var: str
    val_var: str
    source: Expr
    body: Expr  # Block


@dataclass(frozen=True)
class Suppose(Stmt):
    """Subjunctive (reference src/ast.rs:258, examples/subjunctive.us)."""

    delegate: Expr
    branch: Expr  # Block containing EffectCapture `...;` statements
    leaf: Expr  # Block


@dataclass(frozen=True)
class EffectCapture(Stmt):
    """`...;` — replay captured outputs inside a suppose branch."""


@dataclass(frozen=True)
class Import(Stmt):
    module: str
    selector: object = None


@dataclass(frozen=True)
class Export(Stmt):
    name: str | None = None
    decl: Stmt | None = None


@dataclass(frozen=True)
class TemplateCall(Stmt):
    func: Expr
    args: tuple[Expr, ...]
    block: Expr  # Block folded into trailing arg (reference src/ast.rs:503-525)


# --------------------------------------------------------------------------
# Program
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class Program:
    kind: str  # "script" | "lib"
    desc: str
    decls: tuple[Stmt, ...]
    input: Type | None = None
    output: Type | None = None
    body: tuple[Stmt, ...] = field(default_factory=tuple)
