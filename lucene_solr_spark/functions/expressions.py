"""Expression compiler: JavaScript-like scoring expressions -> Spark Columns.

Reference parity: lucene/expressions/src/java/org/apache/lucene/expressions/
js/JavascriptCompiler.java (≈L60) — the module that compiles strings like
"sqrt(_score) + ln(popularity)" into a DoubleValuesSource over field
bindings, used for sort-by-expression and FunctionScoreQuery. This is the
same surface compiled to Catalyst Column expressions instead of bytecode:
the output stays JVM-side inside whole-stage codegen, so an expression
sort is exactly as fast as hand-written Column arithmetic.

Supported grammar (the JavascriptCompiler arithmetic core):
  * numbers (int / decimal / scientific), variable bindings
  * + - * / %, unary -, parentheses
  * comparisons < <= > >= == !=  -> 1.0 / 0.0 (JS-expression booleans
    are doubles, as in the reference)
  * !  && ||  and the ternary cond ? a : b
  * functions: abs, ceil, floor, sqrt, exp, ln, log10, pow, min, max,
    sin, cos, tan, asin, acos, atan, atan2, sinh, cosh, tanh
Out of scope (documented): bitwise ops, haversin/logn (geodist lives in
functions/valuesources.py).

No Python runs per row — compile() happens once on the driver; the result
is a Column tree.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


class ExpressionError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op>\*\*|<=|>=|==|!=|&&|\|\||[-+*/%(),?:<>!]))"
)

_FUNCS_1 = {
    "abs": F.abs, "ceil": F.ceil, "floor": F.floor, "sqrt": F.sqrt,
    "exp": F.exp, "ln": F.log, "log10": F.log10,
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
}
_FUNCS_2 = {
    "pow": F.pow, "min": F.least, "max": F.greatest, "atan2": F.atan2,
}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            if src[i:].strip() == "":
                break
            raise ExpressionError(
                f"unexpected character {src[i]!r} at {i} in {src!r}"
            )
        i = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive descent over the precedence ladder:
    ternary > or > and > equality > relational > additive >
    multiplicative > unary > primary."""

    def __init__(self, tokens, bindings):
        self.toks = tokens
        self.pos = 0
        self.bindings = bindings

    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, op):
        k, v = self.next()
        if k != "op" or v != op:
            raise ExpressionError(f"expected {op!r}, got {v!r}")

    def _accept_op(self, *ops):
        k, v = self.peek()
        if k == "op" and v in ops:
            self.pos += 1
            return v
        return None

    def parse(self) -> Column:
        c = self.ternary()
        k, v = self.peek()
        if k != "eof":
            raise ExpressionError(f"trailing input at token {v!r}")
        return c

    def ternary(self) -> Column:
        cond = self.or_()
        if self._accept_op("?"):
            a = self.ternary()
            self.expect(":")
            b = self.ternary()
            return F.when(cond != 0.0, a).otherwise(b)
        return cond

    def or_(self) -> Column:
        c = self.and_()
        while self._accept_op("||"):
            r = self.and_()
            c = F.when((c != 0.0) | (r != 0.0), 1.0).otherwise(0.0)
        return c

    def and_(self) -> Column:
        c = self.eq()
        while self._accept_op("&&"):
            r = self.eq()
            c = F.when((c != 0.0) & (r != 0.0), 1.0).otherwise(0.0)
        return c

    def eq(self) -> Column:
        c = self.rel()
        while True:
            op = self._accept_op("==", "!=")
            if not op:
                return c
            r = self.rel()
            cond = (c == r) if op == "==" else (c != r)
            c = F.when(cond, 1.0).otherwise(0.0)

    def rel(self) -> Column:
        c = self.add()
        while True:
            op = self._accept_op("<", "<=", ">", ">=")
            if not op:
                return c
            r = self.add()
            cond = {
                "<": c < r, "<=": c <= r, ">": c > r, ">=": c >= r
            }[op]
            c = F.when(cond, 1.0).otherwise(0.0)

    def add(self) -> Column:
        c = self.mul()
        while True:
            op = self._accept_op("+", "-")
            if not op:
                return c
            r = self.mul()
            c = c + r if op == "+" else c - r

    def mul(self) -> Column:
        c = self.unary()
        while True:
            op = self._accept_op("*", "/", "%")
            if not op:
                return c
            r = self.unary()
            c = c * r if op == "*" else (c / r if op == "/" else c % r)

    def unary(self) -> Column:
        if self._accept_op("-"):
            return -self.unary()
        if self._accept_op("!"):
            v = self.unary()
            return F.when(v == 0.0, 1.0).otherwise(0.0)
        return self.primary()

    def primary(self) -> Column:
        k, v = self.next()
        if k == "num":
            return F.lit(float(v))
        if k == "ident":
            nk, nv = self.peek()
            if nk == "op" and nv == "(":
                return self.call(v)
            if v not in self.bindings:
                raise ExpressionError(f"unbound variable {v!r}")
            b = self.bindings[v]
            return b if isinstance(b, Column) else F.col(b)
        if k == "op" and v == "(":
            c = self.ternary()
            self.expect(")")
            return c
        raise ExpressionError(f"unexpected token {v!r}")

    def call(self, name: str) -> Column:
        self.expect("(")
        args = [self.ternary()]
        while self._accept_op(","):
            args.append(self.ternary())
        self.expect(")")
        if name in _FUNCS_1:
            if len(args) != 1:
                raise ExpressionError(f"{name}() takes 1 argument")
            return _FUNCS_1[name](args[0])
        if name in _FUNCS_2:
            if len(args) != 2:
                raise ExpressionError(f"{name}() takes 2 arguments")
            return _FUNCS_2[name](args[0], args[1])
        raise ExpressionError(f"unknown function {name!r}")


def compile_expression(
    src: str, bindings: dict[str, Column | str]
) -> Column:
    """Compile a JS-like expression string into one Column. `bindings`
    maps variable names to Columns (or column-name strings) — the
    SimpleBindings analog. Raises ExpressionError on syntax errors,
    unbound variables, or arity mismatches."""
    return _Parser(_tokenize(src), bindings).parse().cast("double")
