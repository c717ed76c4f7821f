"""Recursive-descent parser for the uDLang kernel language.

Production-for-production coverage of the reference grammar
(reference src/grammar.lalrpop — program :18-21, decls :65-72, statements
:79-92, expression ladder :400-448, call/term :466-489, types :101-145),
implemented as a fresh recursive-descent design with token-index
backtracking where the LR grammar relied on lookahead (lambda vs.
parenthesized expr, map literal vs. block).
"""

from __future__ import annotations

from udlang_spark.kernel import ast
from udlang_spark.kernel.lexer import Token, tokenize


def _subst(t: ast.Type, mapping: dict) -> ast.Type:
    """Parse-time bounded erasure of function type parameters (shared
    structural substitution — kernel/types.substitute_type)."""
    from udlang_spark.kernel.types import substitute_type

    return substitute_type(t, mapping)


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, src: str) -> None:
        self.toks: list[Token] = tokenize(src)
        self.i = 0

    # -- token helpers ---------------------------------------------------
    def peek(self, k: int = 0) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def at(self, kind: str, k: int = 0) -> bool:
        return self.peek(k).kind == kind

    def take(self, kind: str) -> Token:
        t = self.peek()
        if t.kind != kind:
            raise ParseError(f"line {t.line}: expected {kind!r}, got {t.kind!r} ({t.value!r})")
        self.i += 1
        return t

    def accept(self, kind: str) -> Token | None:
        if self.at(kind):
            return self.take(kind)
        return None

    # -- program ---------------------------------------------------------
    def parse_program(self) -> ast.Program:
        self.take("version")
        self.take("VERSION")
        self.take(";")
        if self.accept("script"):
            desc = self.take("STR").value
            self.take(";")
            decls = []
            while not self.at("input"):
                decls.append(self.parse_decl())
            self.take("input")
            input_t = self.parse_type()
            self.take(";")
            self.take("output")
            output_t = self.parse_type()
            self.take(";")
            body = []
            while not self.at("EOF"):
                body.append(self.parse_statement())
            return ast.Program("script", desc, tuple(decls), input_t, output_t, tuple(body))
        self.take("lib")
        desc = self.take("STR").value
        self.take(";")
        decls = []
        while not self.at("EOF"):
            decls.append(self.parse_export() if self.at("export") else self.parse_decl())
        return ast.Program("lib", desc, tuple(decls))

    # -- declarations ----------------------------------------------------
    def parse_decl(self) -> ast.Stmt:
        t = self.peek()
        if t.kind == "import":
            return self.parse_import()
        if t.kind == "func":
            return self.parse_funcdef()
        if t.kind == "proc":
            return self.parse_procdef()
        if t.kind == "template":
            return self.parse_templatedef()
        if t.kind == "type":
            return self.parse_typedef()
        if t.kind == "let":
            return self.parse_let()
        raise ParseError(f"line {t.line}: expected declaration, got {t.kind!r}")

    def parse_import(self) -> ast.Stmt:
        self.take("import")
        module = self.take("ID").value
        sel = None
        if self.accept("."):
            sel = self._import_selector()
        self.take(";")
        return ast.Import(module, sel)

    def _import_selector(self):
        if self.accept("_"):
            return "_"
        if self.accept("*"):
            return "*"
        if self.accept("{"):
            items = []
            while not self.at("}"):
                items.append(self._import_selector())
                if not self.accept(","):
                    break
            self.take("}")
            return tuple(items)
        name = self.take("ID").value
        if self.accept("as"):
            return (name, "as", self.take("ID").value)
        if self.accept("."):
            return (name, ".", self._import_selector())
        return name

    def parse_export(self) -> ast.Stmt:
        self.take("export")
        if self.at("func"):
            return ast.Export(decl=self.parse_funcdef())
        if self.at("proc"):
            return ast.Export(decl=self.parse_procdef())
        if self.at("type"):
            return ast.Export(decl=self.parse_typedef())
        if self.at("let"):
            return ast.Export(decl=self.parse_let())
        if self.at("template"):
            return ast.Export(decl=self.parse_templatedef())
        if self.at("TYPENAME"):
            name = self.take("TYPENAME").value
            self.take(";")
            return ast.Export(name=name)
        name = self.take("ID").value
        if self.accept("="):
            val = self.parse_expr()
            self.take(";")
            return ast.Export(decl=ast.Let(name, val))
        self.take(";")
        return ast.Export(name=name)

    def parse_funcdef(self) -> ast.Stmt:
        self.take("func")
        name = self.take("ID").value
        tparams = self.parse_type_params()
        args, rest = self.parse_arglist()
        self.take("->")
        ret = self.parse_type()
        body = self.parse_block_expr()
        if tparams:
            args = [(n, _subst(t, tparams)) for n, t in args]
            ret = _subst(ret, tparams)
            if rest is not None:
                rest = (rest[0], _subst(rest[1], tparams))
        return ast.Let(name, ast.Lambda(tuple(args), ret, body, rest_param=rest))

    def parse_type_params(self) -> dict:
        """Generic FUNCTION type parameters `func add<T: Int>(...)`
        (reference manual.md:118 — docs-only there). Functions inline at
        call sites, so the parameters lower by BOUNDED ERASURE at parse
        time: each occurrence of T in the signature substitutes to its
        bound (`T: Int` → Int) or to Any when unbounded — the same
        semantics the documented example needs, with zero runtime
        artifact."""
        tparams: dict[str, ast.Type] = {}
        if self.at("<"):
            self.take("<")
            while not self.at(">"):
                pname = self.take("TYPENAME").value
                bound: ast.Type = ast.T_ANY
                if self.accept(":"):
                    bound = self.parse_type()
                tparams[pname] = bound
                if not self.accept(","):
                    break
            self.take(">")
        return tparams

    def parse_procdef(self) -> ast.Stmt:
        self.take("proc")
        name = self.take("ID").value
        args, rest = self.parse_arglist()
        body = self.parse_block_stmt()
        return ast.Let(
            name, ast.Lambda(tuple(args), ast.T_VOID, body, rest_param=rest)
        )

    def parse_templatedef(self) -> ast.Stmt:
        # template name(args) using delegate {body} — desugars to a function
        # whose last parameter is the delegate (reference src/ast.rs:503-525).
        self.take("template")
        name = self.take("ID").value
        args, rest = self.parse_arglist()
        if rest is not None:
            raise ParseError(
                "a template cannot declare a rest parameter (the delegate "
                "block is already its trailing argument)"
            )
        self.take("using")
        delegate = self.take("ID").value
        body = self.parse_block_stmt()
        params = tuple(args) + ((delegate, ast.T_ANY),)
        return ast.Let(name, ast.Lambda(params, ast.T_VOID, body))

    def parse_typedef(self) -> ast.Stmt:
        self.take("type")
        name = self.take("TYPENAME").value
        params: list[str] = []
        if self.at("<"):
            # parameterized typedef `type Box<T>: ...;` — the TFunc
            # definition form (reference src/ast.rs:205, AST-only there)
            self.take("<")
            while not self.at(">"):
                params.append(self.take("TYPENAME").value)
                if not self.accept(","):
                    break
            self.take(">")
        self.take(":")
        t = self.parse_type()
        self.take(";")
        if params:
            return ast.TypeDef(name, ast.TFunc(tuple(params), t))
        return ast.TypeDef(name, t)

    def parse_destructure(self) -> ast.Stmt:
        self.take("let")
        self.take("{")
        names = [self.take("ID").value]
        while self.accept(","):
            names.append(self.take("ID").value)
        self.take("}")
        self.take("=")
        value = self.parse_expr()
        self.take(";")
        return ast.Destructure(tuple(names), value)

    def parse_let(self) -> ast.Stmt:
        if self.at("{", 1):
            return self.parse_destructure()
        self.take("let")
        name = self.take("ID").value
        self.take("=")
        value = self.parse_expr()
        self.take(";")
        return ast.Let(name, value)

    def parse_arglist(
        self,
    ) -> tuple[list[tuple[str, ast.Type]], tuple[str, ast.Type] | None]:
        """Returns (params, rest_param). `...name: T` (reference
        README.md:335-336) declares a trailing rest parameter whose bound
        value is a list of T; it must be the final parameter."""
        self.take("(")
        args: list[tuple[str, ast.Type]] = []
        rest: tuple[str, ast.Type] | None = None
        while not self.at(")"):
            if self.accept("..."):
                name = self.take("ID").value
                self.take(":")
                rest = (name, self.parse_type())
                self.accept(",")
                break
            name = self.take("ID").value
            self.take(":")
            t = self.parse_type()
            args.append((name, t))
            if not self.accept(","):
                break
        self.take(")")
        return args, rest

    # -- statements ------------------------------------------------------
    def parse_statement(self) -> ast.Stmt:
        t = self.peek()
        if t.kind == "func":
            return self.parse_funcdef()
        if t.kind == "proc":
            return self.parse_procdef()
        if t.kind == "type":
            return self.parse_typedef()
        if t.kind == "let":
            return self.parse_let()
        if t.kind == "out":
            self.take("out")
            value = self.parse_expr()
            self.take(";")
            return ast.Out(value)
        if t.kind == "throw":
            self.take("throw")
            value = self.parse_expr()
            self.take(";")
            return ast.Throw(value)
        if t.kind == "if":
            return ast.ExprStmt(self.parse_cond(stmt=True))
        if t.kind == "for":
            return self.parse_iteration()
        if t.kind == "suppose":
            return self.parse_suppose()
        if t.kind == "...":
            self.take("...")
            self.take(";")
            return ast.EffectCapture()
        if t.kind == "{":
            return ast.ExprStmt(self.parse_block_stmt())
        # TemplateCall | bare call for effect (reference src/grammar.lalrpop:458-463)
        expr = self.parse_call()
        if isinstance(expr, ast.Call) and self.at("{"):
            block = self.parse_block_stmt()
            return ast.TemplateCall(expr.func, expr.args, block)
        self.take(";")
        return ast.ExprStmt(expr)

    def parse_iteration(self) -> ast.Stmt:
        self.take("for")
        if self.accept("("):
            k = self.take("ID").value
            self.take(",")
            v = self.take("ID").value
            self.take(")")
            self.take("in")
            source = self.parse_expr()
            body = self.parse_block_stmt()
            return ast.MapIter(k, v, source, body)
        var = self.take("ID").value
        self.take("in")
        source = self.parse_expr()
        body = self.parse_block_stmt()
        return ast.ListIter(var, source, body)

    def parse_match(self) -> ast.Expr:
        """`match subject { case pat: expr; ... }` (reference manual.md:
        124-132; documented only — no grammar rule in the reference)."""
        self.take("match")
        subject = self.parse_logic()
        self.take("{")
        arms: list[ast.MatchArm] = []
        while self.accept("case"):
            pat = self.parse_pattern()
            self.take(":")
            body = self.parse_expr()
            self.take(";")
            arms.append(ast.MatchArm(pat, body))
        self.take("}")
        if not arms:
            raise ParseError("match with no case arms")
        return ast.Match(subject, tuple(arms))

    def parse_pattern(self) -> ast.Pattern:
        t = self.peek()
        if t.kind == "STR":
            return ast.PLit(self.take("STR").value)
        if t.kind == "INT":
            return ast.PLit(int(self.take("INT").value))
        if t.kind == "FLOAT":
            return ast.PLit(float(self.take("FLOAT").value))
        if t.kind == "-" and self.peek(1).kind in ("INT", "FLOAT"):
            self.take("-")
            n = self.peek()
            if n.kind == "INT":
                return ast.PLit(-int(self.take("INT").value))
            return ast.PLit(-float(self.take("FLOAT").value))
        if t.kind == "true":
            self.take("true")
            return ast.PLit(True)
        if t.kind == "false":
            self.take("false")
            return ast.PLit(False)
        if t.kind == "TYPENAME" and t.value == "None":
            self.take("TYPENAME")
            return ast.PNone()
        if t.kind == "ID":
            name = self.take("ID").value
            # `s:Float:` is a typed bind; `p:` alone is a bare bind whose `:`
            # separates pattern from body — disambiguate by backtracking
            save = self.i
            if self.accept(":"):
                try:
                    ty = self.parse_type()
                    if self.at(":"):
                        return ast.PBind(name, ty)
                except ParseError:
                    pass
                self.i = save
            return ast.PBind(name, None)
        raise ParseError(f"line {t.line}: unexpected token {t.kind!r} in pattern")

    def parse_suppose(self) -> ast.Stmt:
        self.take("suppose")
        self.take("(")
        delegate = self.parse_expr()
        self.take(")")
        branch = self.parse_block_stmt()
        self.take("else")
        leaf = self.parse_block_stmt()
        return ast.Suppose(delegate, branch, leaf)

    def parse_block_stmt(self) -> ast.Expr:
        self.take("{")
        stmts: list[ast.Stmt] = []
        while not self.at("}"):
            stmts.append(self.parse_statement())
        self.take("}")
        return ast.Block(tuple(stmts), None)

    # -- expressions -----------------------------------------------------
    def parse_expr(self) -> ast.Expr:
        if self.at("{"):
            save = self.i
            try:
                return self.parse_block_expr()
            except ParseError:
                self.i = save
                return self.parse_simple_expr()
        return self.parse_simple_expr()

    def parse_block_expr(self) -> ast.Expr:
        # { stmts... trailing-expr } — trailing expr mandatory, `done` = void
        # (reference src/grammar.lalrpop:388-396, 312-315)
        self.take("{")
        stmts: list[ast.Stmt] = []
        while True:
            if self.accept("done"):
                self.take("}")
                return ast.Block(tuple(stmts), None)
            save = self.i
            try:
                ret = self.parse_simple_expr()
                if self.at("}"):
                    self.take("}")
                    return ast.Block(tuple(stmts), ret)
                self.i = save
            except ParseError:
                self.i = save
            if self.at("}"):
                raise ParseError(
                    f"line {self.peek().line}: block expression needs a trailing expression"
                )
            stmts.append(self.parse_statement())

    def parse_simple_expr(self) -> ast.Expr:
        # Lambda | CondExpr | Logic (reference src/grammar.lalrpop:318-323)
        if self.at("("):
            save = self.i
            lam = self._try_lambda()
            if lam is not None:
                return lam
            self.i = save
        if self.at("if"):
            return self.parse_cond(stmt=False)
        if self.at("attempt"):
            return self.parse_attempt()
        return self.parse_logic()

    def parse_attempt(self) -> ast.Expr:
        # attempt <expr> recover [(name)] <expr> — see ast.Attempt
        self.take("attempt")
        body = self.parse_expr()
        self.take("recover")
        bind: str | None = None
        if self.accept("("):
            bind = self.take("ID").value
            self.take(")")
        fallback = self.parse_expr()
        return ast.Attempt(body, bind, fallback)

    def _try_lambda(self) -> ast.Expr | None:
        try:
            args, rest = self.parse_arglist()
        except ParseError:
            return None
        if self.accept("->"):
            ret = self.parse_type()
            if self.accept("="):
                return ast.Lambda(
                    tuple(args), ret, self.parse_simple_expr(), rest_param=rest
                )
            if self.at("{"):
                return ast.Lambda(
                    tuple(args), ret, self.parse_block_expr(), rest_param=rest
                )
            return None
        if self.accept("="):
            return ast.Lambda(
                tuple(args), ast.T_ANY, self.parse_simple_expr(), rest_param=rest
            )
        if self.at("{"):
            return ast.Lambda(
                tuple(args), ast.T_VOID, self.parse_block_stmt(), rest_param=rest
            )
        return None

    def parse_cond(self, stmt: bool) -> ast.Expr:
        self.take("if")
        clauses = []
        clauses.append(self._cond_clause(stmt))
        while self.accept("elif"):
            clauses.append(self._cond_clause(stmt))
        default = None
        if self.accept("else"):
            default = self.parse_block_stmt() if stmt else self.parse_block_expr()
        return ast.Cond(tuple(clauses), default)

    def _cond_clause(self, stmt: bool) -> tuple[ast.Expr, ast.Expr]:
        self.take("(")
        pred = self.parse_expr()
        self.take(")")
        body = self.parse_block_stmt() if stmt else self.parse_block_expr()
        return (pred, body)

    def parse_logic(self) -> ast.Expr:
        a = self.parse_rel()
        while self.peek().kind in ("and", "or", "xor"):
            op = self.take(self.peek().kind).kind
            a = ast.Bin(op, a, self.parse_rel())
        return a

    def parse_rel(self) -> ast.Expr:
        a = self.parse_sum()
        while self.peek().kind in ("<", ">", "<=", ">=", "==", "!="):
            op = self.take(self.peek().kind).kind
            b = self.parse_sum()
            # != is ours (absent from the reference op set, SURVEY.md §2.3)
            a = ast.Un("not", ast.Bin("==", a, b)) if op == "!=" else ast.Bin(op, a, b)
        return a

    def parse_sum(self) -> ast.Expr:
        a = self.parse_factor()
        while self.peek().kind in ("+", "-"):
            op = self.take(self.peek().kind).kind
            a = ast.Bin(op, a, self.parse_factor())
        return a

    def parse_factor(self) -> ast.Expr:
        a = self.parse_exp()
        while self.peek().kind in ("*", "/", "%"):
            op = self.take(self.peek().kind).kind
            a = ast.Bin(op, a, self.parse_exp())
        return a

    def parse_exp(self) -> ast.Expr:
        a = self.parse_invterm()
        while self.at("^"):
            self.take("^")
            a = ast.Bin("^", a, self.parse_invterm())
        return a

    def parse_invterm(self) -> ast.Expr:
        if self.accept("-"):
            return ast.Un("-", self.parse_invterm())
        if self.accept("not"):
            return ast.Un("not", self.parse_invterm())
        if self.accept("!"):
            # `!` debug: trace to stderr, value unchanged (manual.md:54-62;
            # IR Debug src/ir.rs:201 — the reference grammar never wired it)
            return ast.Un("!", self.parse_invterm())
        a = self.parse_call()
        # `as` cast binds tighter than arithmetic: `x as F32 + y` is
        # `(x as F32) + y` (reference manual.md:118-121). parse_type_cons
        # (not parse_type) so a following `|` stays with the expression.
        while self.accept("as"):
            a = ast.Cast(a, self.parse_type_cons())
        return a

    def parse_call(self) -> ast.Expr:
        a = self.parse_term()
        while True:
            if self.accept("("):
                args = []
                while not self.at(")"):
                    if self.accept("$"):
                        # `$...` forwards the callee's rest args through the
                        # curried function (reference README.md:370-373)
                        if self.accept("..."):
                            args.append(ast.PartialRest())
                        else:
                            args.append(ast.Partial())
                    elif self.accept("..."):
                        args.append(ast.Spread(self.parse_expr()))
                    else:
                        args.append(self.parse_expr())
                    if not self.accept(","):
                        break
                self.take(")")
                a = ast.Call(a, tuple(args))
            elif self.at(".?."):
                self.take(".?.")
                a = ast.Has(a, self.take("ID").value)
            elif self.accept("."):
                a = ast.Dot(a, self.take("ID").value)
            elif self.accept("["):
                idx = self.parse_expr()
                self.take("]")
                a = ast.Index(a, idx)
            else:
                return a

    def parse_term(self) -> ast.Expr:
        t = self.peek()
        if t.kind == "self":
            self.take("self")
            return ast.SelfExpr()
        if t.kind == "in":
            self.take("in")
            return ast.In()
        if t.kind == "match":
            return self.parse_match()
        if t.kind == "$":
            self.take("$")
            return ast.Partial()
        if t.kind == "ID":
            return ast.Id(self.take("ID").value)
        if t.kind == "INT":
            return ast.Lit(int(self.take("INT").value))
        if t.kind == "FLOAT":
            return ast.Lit(float(self.take("FLOAT").value))
        if t.kind == "STR":
            return ast.Lit(self.take("STR").value)
        if t.kind == "true":
            self.take("true")
            return ast.Lit(True)
        if t.kind == "false":
            self.take("false")
            return ast.Lit(False)
        if t.kind == "(":
            # arrow lambda `(item) => expr` (reference README.md:172) or
            # parenthesized expression — backtrack on mismatch
            save = self.i
            self.take("(")
            params: list[tuple[str, ast.Type]] = []
            ok = True
            while self.at("ID") and ok:
                name = self.take("ID").value
                ptype: ast.Type = ast.T_ANY
                if self.accept(":"):
                    try:
                        ptype = self.parse_type()
                    except ParseError:
                        ok = False
                        break
                params.append((name, ptype))
                if not self.accept(","):
                    break
            if ok and params and self.at(")") and self.at("=>", 1):
                self.take(")")
                self.take("=>")
                return ast.Lambda(tuple(params), ast.T_ANY, self.parse_expr())
            self.i = save
            self.take("(")
            e = self.parse_expr()
            if self.at(","):
                items = [e]
                while self.accept(","):
                    items.append(self.parse_expr())
                self.take(")")
                return ast.TupleExpr(tuple(items))
            self.take(")")
            return e
        if t.kind == "[":
            self.take("[")
            items = []
            first = True
            while not self.at("]"):
                e = self.parse_expr()
                if first and self.accept("|"):
                    # comprehension `[xs | f]` (reference README.md:171-177)
                    fn = self.parse_expr()
                    self.take("]")
                    return ast.Comprehension(e, fn)
                first = False
                items.append(e)
                if not self.accept(","):
                    break
            self.take("]")
            return ast.ListExpr(tuple(items))
        if t.kind == "{":
            self.take("{")
            items = []
            while not self.at("}"):
                if self.at("STR"):
                    k = self.take("STR").value
                else:
                    k = self.take("ID").value
                self.take(":")
                items.append((k, self.parse_logic()))
                if not self.accept(","):
                    break
            self.take("}")
            return ast.MapExpr(tuple(items))
        raise ParseError(f"line {t.line}: unexpected token {t.kind!r} in expression")

    # -- types -----------------------------------------------------------
    def parse_type(self) -> ast.Type:
        t = self.parse_type_union()
        if self.accept("?"):
            return ast.TOption(t)
        return t

    def parse_type_union(self) -> ast.Type:
        self.accept("|")  # leading | allowed (reference src/grammar.lalrpop:116)
        a = self.parse_type_cons()
        if self.at("|"):
            variants = [a]
            while self.accept("|"):
                variants.append(self.parse_type_cons())
            flat: list[ast.Type] = []
            for v in variants:
                if isinstance(v, ast.TUnion):
                    flat.extend(v.variants)
                else:
                    flat.append(v)
            return ast.TUnion(tuple(flat))
        return a

    def parse_type_cons(self) -> ast.Type:
        t = self.parse_type_term()
        while self.at("<"):
            self.take("<")
            args = []
            while not self.at(">"):
                args.append(self.parse_type())
                if not self.accept(","):
                    break
            self.take(">")
            t = ast.TCons(t, tuple(args))
        return t

    PRIMS = {
        "Void": ast.T_VOID,
        "Bool": ast.T_BOOL,
        "Int": ast.T_INT,
        "Float": ast.T_FLOAT,
        "Str": ast.T_STR,
        "Point": ast.T_POINT,
        "Self": ast.T_SELF,
        "Any": ast.T_ANY,
    }

    def parse_type_term(self) -> ast.Type:
        t = self.peek()
        # literal/value types: `input "Hello" | "Goodnight"` (manual.md:97)
        if t.kind == "STR":
            return ast.TValue(self.take("STR").value)
        if t.kind == "INT":
            return ast.TValue(int(self.take("INT").value))
        if t.kind == "FLOAT":
            return ast.TValue(float(self.take("FLOAT").value))
        if t.kind == "true":
            self.take("true")
            return ast.TValue(True)
        if t.kind == "false":
            self.take("false")
            return ast.TValue(False)
        if t.kind == "TYPENAME":
            name = self.take("TYPENAME").value
            if name in self.PRIMS:
                return self.PRIMS[name]
            return ast.TName(name)
        if t.kind == "{":
            # record (member keywords) or map type (reference src/grammar.lalrpop:140-149)
            if self.peek(1).kind in ("field", "method", "const", "static", "}"):
                return self.parse_record_type()
            self.take("{")
            inner = self.parse_type()
            self.take("}")
            return ast.TMap(inner)
        if t.kind == "(":
            # lambda type `(x: T) -> R` (used by examples/scopes.us:23 though
            # the reference grammar never wired TypeTag::Lambda in) — or a
            # parenthesized type.
            save = self.i
            try:
                args, _rest = self.parse_arglist()
                self.take("->")
                ret = self.parse_type()
                return ast.TLambda(tuple(t for _, t in args), ret)
            except ParseError:
                self.i = save
            self.take("(")
            inner = self.parse_type()
            self.take(")")
            return inner
        if t.kind == "<":
            self.take("<")
            items = []
            while not self.at(">"):
                items.append(self.parse_type())
                if not self.accept(","):
                    break
            self.take(">")
            return ast.TTuple(tuple(items))
        if t.kind == "[":
            self.take("[")
            item = self.parse_type()
            self.take("]")
            return ast.TList(item)
        raise ParseError(f"line {t.line}: unexpected token {t.kind!r} in type")

    def parse_record_type(self) -> ast.Type:
        self.take("{")
        fields: list[ast.TRecordField] = []
        methods: list = []
        while not self.at("}"):
            kw = self.peek()
            if kw.kind == "field":
                self.take("field")
                optional = bool(self.accept("?"))
                name = self.take("ID").value
                self.take(":")
                ftype = self.parse_type()
                fields.append(ast.TRecordField(name, ftype, optional))
            elif kw.kind in ("method", "static"):
                self.take(kw.kind)
                name = self.take("ID").value
                args, _rest = self.parse_arglist()
                self.take("->")
                ret = self.parse_type()
                body = self.parse_expr()
                methods.append((kw.kind, name, tuple(args), ret, body))
            elif kw.kind == "const":
                self.take("const")
                name = self.take("ID").value
                self.take(":")
                ctype = self.parse_type()
                self.take("=")
                value = self.parse_expr()
                methods.append(("const", name, ctype, value))
            else:
                raise ParseError(f"line {kw.line}: unexpected {kw.kind!r} in record type")
            if not self.accept(";"):
                break
        self.take("}")
        return ast.TRecord(tuple(fields), tuple(methods))


def parse(src: str) -> ast.Program:
    return Parser(src).parse_program()


def parse_expr(src: str) -> ast.Expr:
    p = Parser(src)
    e = p.parse_expr()
    p.take("EOF")
    return e
