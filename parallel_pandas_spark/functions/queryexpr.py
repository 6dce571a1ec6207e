"""pandas ``DataFrame.query`` expression → Spark SQL predicate.

pandas query strings are Python expressions (``a > 1 & b == "x"``,
``and/or/not``, ``in``/``not in``, backtick-quoted names, ``@var`` host
references). Rather than regex-rewriting (fragile inside string
literals), the expression is parsed with :mod:`ast` and compiled to an
ANSI SQL boolean expression, which Catalyst then optimizes and pushes
down like any native filter — the translated predicate reaches the
parquet scan as ``PushedFilters``, so ``p_query`` is exactly as
scan-efficient as a hand-written ``.where``.

Supported surface (the practical pandas subset): comparisons (incl.
chained ``1 < a < 5``), ``& | ~`` and ``and or not``, arithmetic
``+ - * / % **``, ``in``/``not in`` over literal lists/tuples/sets,
``@var`` host-variable substitution (scalars, strings, lists),
``.isnull()``/``.notnull()``/``.isna()``/``.notna()`` method calls on
columns, and backtick-quoted column names. Anything else raises
``ValueError`` naming the unsupported node.
"""

from __future__ import annotations

import ast
import re

_CMP = {
    ast.Lt: "<", ast.LtE: "<=", ast.Gt: ">", ast.GtE: ">=",
    ast.Eq: "=", ast.NotEq: "<>",
}
_BIN = {
    ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Div: "/", ast.Mod: "%",
}


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        # Backslashes first: the session parser runs with
        # escapedStringLiterals=false (the Spark default), so an unescaped
        # backslash would be read as a C-style escape — 'a\b' would compare
        # against "a<backspace>" and a trailing '\' would swallow the
        # closing quote (PARSE_SYNTAX_ERROR).
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "(" + ", ".join(_lit(x) for x in v) + ")"
    if isinstance(v, set):  # deterministic order for plan stability
        return "(" + ", ".join(_lit(x) for x in sorted(v, key=repr)) + ")"
    raise ValueError(f"unsupported literal {v!r} in query expression")


def to_sql(expr: str, env: dict | None = None) -> str:
    """Translate a pandas query string to a Spark SQL predicate string."""
    env = env or {}
    bq: dict[str, str] = {}

    # Pre-pass: rewrite backticked names and @vars OUTSIDE string
    # literals only — a quote-state scanner, not a regex, because
    # "x@y.com" or 'a`b' inside a literal must pass through untouched.
    out_chars: list[str] = []
    i, n_src, quote = 0, len(expr), None
    while i < n_src:
        ch = expr[i]
        if quote:
            out_chars.append(ch)
            if ch == "\\" and i + 1 < n_src:  # escaped char inside literal
                out_chars.append(expr[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in "'\"":
            quote = ch
            out_chars.append(ch)
            i += 1
            continue
        if ch == "`":
            j = expr.find("`", i + 1)
            if j < 0:
                raise ValueError(f"unterminated backtick in query expression {expr!r}")
            key = f"__bq_{len(bq)}__"
            bq[key] = expr[i + 1 : j]
            out_chars.append(key)
            i = j + 1
            continue
        if ch == "@":
            m = re.match(r"@(\w+)", expr[i:])
            if m:
                out_chars.append(f"__at_{m.group(1)}__")
                i += m.end()
                continue
        out_chars.append(ch)
        i += 1
    src = "".join(out_chars)
    # pandas gives & | ~ BOOLEAN precedence (looser than comparisons);
    # Python binds them tighter, so `a > 1 & b == 2` would parse as
    # `a > (1 & b) == 2`. Rewrite at the token level (never inside string
    # literals) to and/or/not first — the same normalization pandas'
    # expression parser applies.
    import io
    import tokenize as tk

    try:
        toks = list(tk.generate_tokens(io.StringIO(src).readline))
        mapped = [
            (tk.NAME, {"&": "and", "|": "or", "~": "not"}[t.string])
            if t.type == tk.OP and t.string in ("&", "|", "~")
            else (t.type, t.string)
            for t in toks
        ]
        src = tk.untokenize(mapped)
        tree = ast.parse(src, mode="eval")
    except (SyntaxError, tk.TokenError) as e:
        raise ValueError(f"cannot parse query expression {expr!r}: {e}") from e

    def name(n: str) -> str:
        if n in bq:
            return f"`{bq[n]}`"
        if n.startswith("__at_") and n.endswith("__"):
            var = n[5:-2]
            if var not in env:
                raise ValueError(f"@{var} not supplied in env=")
            return _lit(env[var])
        return f"`{n}`"

    def g(node) -> str:
        if isinstance(node, ast.Expression):
            return g(node.body)
        if isinstance(node, ast.BoolOp):
            op = " AND " if isinstance(node.op, ast.And) else " OR "
            return "(" + op.join(g(v) for v in node.values) + ")"
        if isinstance(node, ast.UnaryOp):
            if isinstance(node.op, (ast.Not, ast.Invert)):
                return f"(NOT {g(node.operand)})"
            if isinstance(node.op, ast.USub):
                return f"(-{g(node.operand)})"
            raise ValueError(f"unsupported unary op {ast.dump(node.op)}")
        if isinstance(node, ast.BinOp):
            if isinstance(node.op, ast.BitAnd):
                return f"({g(node.left)} AND {g(node.right)})"
            if isinstance(node.op, ast.BitOr):
                return f"({g(node.left)} OR {g(node.right)})"
            if isinstance(node.op, ast.Pow):
                return f"POWER({g(node.left)}, {g(node.right)})"
            if isinstance(node.op, ast.Mod):
                # Python % takes the DIVISOR's sign; SQL % the dividend's.
                # ((a % b) + b) % b reproduces Python for every sign pair.
                a, b_ = g(node.left), g(node.right)
                return f"((({a} % {b_}) + {b_}) % {b_})"
            if type(node.op) in _BIN:
                return f"({g(node.left)} {_BIN[type(node.op)]} {g(node.right)})"
            raise ValueError(f"unsupported operator {ast.dump(node.op)}")
        if isinstance(node, ast.Compare):
            parts = []
            left = node.left
            for op, right in zip(node.ops, node.comparators):
                if isinstance(op, (ast.In, ast.NotIn)):
                    kw = "IN" if isinstance(op, ast.In) else "NOT IN"
                    parts.append(f"{g(left)} {kw} {g(right)}")
                elif type(op) in _CMP:
                    parts.append(f"{g(left)} {_CMP[type(op)]} {g(right)}")
                else:
                    raise ValueError(f"unsupported comparison {ast.dump(op)}")
                left = right
            return "(" + " AND ".join(parts) + ")"
        if isinstance(node, ast.Call):
            if (
                isinstance(node.func, ast.Attribute)
                and not node.args
                and not node.keywords
            ):
                col = g(node.func.value)
                m = node.func.attr
                if m in ("isnull", "isna"):
                    return f"({col} IS NULL)"
                if m in ("notnull", "notna"):
                    return f"({col} IS NOT NULL)"
            raise ValueError(
                f"unsupported call in query expression: {ast.unparse(node)!r}"
            )
        if isinstance(node, ast.Name):
            return name(node.id)
        if isinstance(node, ast.Constant):
            return _lit(node.value)
        if isinstance(node, (ast.List, ast.Tuple, ast.Set)):
            return "(" + ", ".join(g(e) for e in node.elts) + ")"
        raise ValueError(
            f"unsupported syntax in query expression: {ast.dump(node)[:80]}"
        )

    return g(tree)
