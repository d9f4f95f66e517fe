"""GOQL parser — grammar per the reference's MatcherParser.java.

query    := selector (',' selector)*
selector := ('*' | [nwar]+)? clause*
clause   := '[' ('!' key | key (op value-list)?) ']'
op       := '=' | '!=' | '>' | '>=' | '<' | '<=' | '~' | '!~'

Error semantics mirror the reference (queries.fab:636-664 golden cases):
syntax / expected_number / expected_string / expected_single /
expected_key / conflict — raised as GoqlError(kind).

Operator properties (MatcherParser.java:154-178 operatorFlags):
- '='  : requires key, number|string, list allowed, OR-combined, wildcards
- '!=' : key optional (absent matches), list AND-combined, wildcards
- '~'  : requires key, string only, list OR-combined
- '!~' : key optional, string only, list AND-combined
- comparisons: require key, number only, single value

Wildcard desugaring (MatcherParser.java:350-379): in '='/'!=' string
values, leading/trailing '*' become contains/starts-with/ends-with;
for '!=' the term is negated ("negate" flag).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class GoqlError(Exception):
    def __init__(self, kind: str, message: str = ""):
        super().__init__(f"{kind}: {message}")
        self.kind = kind


# Term ops after desugaring
EQ_NUM, EQ_STR, GT, GE, LT, LE, MATCH = "eq_num", "eq_str", "gt", "ge", "lt", "le", "match"
STARTS, ENDS, CONTAINS = "starts", "ends", "contains"


@dataclass
class Term:
    op: str
    value: object  # float for numbers, str otherwise
    negate: bool = False  # from '!=' / '!~' desugaring


@dataclass
class Clause:
    key: str
    key_required: bool  # [k], '=', '~', comparisons
    absent: bool = False  # [!k]
    terms: list = field(default_factory=list)
    combine: str = "or"  # 'or' for =/~ lists, 'and' for !=/!~ lists


@dataclass
class Selector:
    types: str  # subset of "nwar" or "*"
    clauses: list = field(default_factory=list)


TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>-?[0-9]+(?:\.[0-9]+)?)(?![A-Za-z0-9_:]) |
        (?P<ident>[A-Za-z_][A-Za-z0-9_:\-]*) |
        (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*') |
        (?P<op>!~|!=|>=|<=|=|>|<|~|\[|\]|,|\*|!)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str):
    out = []
    pos = 0
    while pos < len(s):
        m = TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise GoqlError("syntax", f"unexpected character at {pos}: {s[pos]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", float(m.group("num"))))
        elif m.lastgroup == "ident":
            out.append(("ident", m.group("ident")))
        elif m.lastgroup == "str":
            raw = m.group("str")[1:-1]
            out.append(("str", re.sub(r"\\(.)", r"\1", raw)))
        else:
            out.append((m.group("op"), m.group("op")))
    out.append(("eof", None))
    return out


OP_PROPS = {
    # (requires_key, allow_num, allow_str, allow_list, or_combined, exact)
    "=": (True, True, True, True, True, True),
    "!=": (False, True, True, True, False, True),
    "~": (True, False, True, True, True, False),
    "!~": (False, False, True, True, False, False),
    ">": (True, True, False, False, True, False),
    ">=": (True, True, False, False, True, False),
    "<": (True, True, False, False, True, False),
    "<=": (True, True, False, False, True, False),
}
CMP_OP = {">": GT, ">=": GE, "<": LT, "<=": LE}


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse_query(self) -> list[Selector]:
        sels = [self.parse_selector()]
        while self.peek()[0] == ",":
            self.next()
            sels.append(self.parse_selector())
        if self.peek()[0] != "eof":
            raise GoqlError("syntax", f"unexpected token {self.peek()!r}")
        return sels

    def parse_selector(self) -> Selector:
        kind, val = self.peek()
        if kind == "*":
            self.next()
            types = "*"
        elif kind == "ident":
            if not all(c in "nwar" for c in val) or len(set(val)) != len(val):
                raise GoqlError("syntax", f"unknown feature type {val!r}")
            self.next()
            types = val
        elif kind == "[":
            types = "*"
        else:
            raise GoqlError("syntax", f"expected selector, got {val!r}")
        sel = Selector(types)
        while self.peek()[0] == "[":
            sel.clauses.append(self.parse_clause())
        self._merge_clauses(sel)
        return sel

    def _expect_key(self) -> str:
        kind, val = self.next()
        if kind in ("ident", "str"):
            return val
        raise GoqlError("expected_key", f"expected key, got {val!r}")

    def parse_clause(self) -> Clause:
        assert self.next()[0] == "["
        if self.peek()[0] == "!":
            self.next()
            if self.peek()[0] == "]":
                raise GoqlError("expected_key", "expected key after '!'")
            key = self._expect_key()
            if self.next()[0] != "]":
                raise GoqlError("syntax", "expected ']' after [!key")
            return Clause(key, key_required=False, absent=True)

        key = self._expect_key()
        kind, val = self.peek()
        if kind == "]":
            self.next()
            return Clause(key, key_required=True)
        if kind not in OP_PROPS:
            raise GoqlError("syntax", f"expected operator, got {val!r}")
        op = kind
        self.next()
        requires_key, allow_num, allow_str, allow_list, or_comb, exact = OP_PROPS[op]
        clause = Clause(key, key_required=requires_key, combine="or" if or_comb else "and")

        while True:
            vkind, vval = self.next()
            if vkind == "num":
                if not allow_num:
                    raise GoqlError("expected_string", f"{op} requires a string")
                if op in CMP_OP:
                    clause.terms.append(Term(CMP_OP[op], float(vval)))
                else:
                    clause.terms.append(Term(EQ_NUM, float(vval), negate=(op == "!=")))
            elif vkind in ("ident", "str"):
                if not allow_str:
                    raise GoqlError("expected_number", f"{op} requires a number")
                if op in ("~", "!~"):
                    clause.terms.append(Term(MATCH, vval, negate=(op == "!~")))
                else:
                    clause.terms.append(self._string_term(op, vval, exact))
            else:
                raise GoqlError("syntax", f"expected value, got {vval!r}")
            if self.peek()[0] != ",":
                break
            self.next()
            if not allow_list:
                raise GoqlError("expected_single", f"multiple values not allowed for {op}")
        if self.next()[0] != "]":
            raise GoqlError("syntax", "expected ']'")
        return clause

    @staticmethod
    def _string_term(op: str, s: str, exact: bool) -> Term:
        negate = op == "!="
        if exact and len(s) > 0:
            if s[0] == "*":
                if len(s) > 1 and s[-1] == "*":
                    return Term(CONTAINS, s[1:-1], negate=negate)
                return Term(CONTAINS if len(s) == 1 else ENDS, s[1:], negate=negate)
            if s[-1] == "*":
                return Term(STARTS, s[:-1], negate=negate)
        return Term(EQ_STR, s, negate=negate)

    @staticmethod
    def _merge_clauses(sel: Selector):
        """Same-key clause merge + conflict detection (TagClause.java:109-162).

        - [!k] + key-required clause → QueryException("conflict")
        - [!k] + [k!=v] → [!k] (the NE clause is dropped)
        """
        by_key: dict[str, list[Clause]] = {}
        for c in sel.clauses:
            by_key.setdefault(c.key, []).append(c)
        merged = []
        for key, cs in by_key.items():
            absent = [c for c in cs if c.absent]
            required = [c for c in cs if c.key_required]
            if absent and required:
                raise GoqlError("conflict", f"conflicting clauses for key {key}")
            if absent:
                merged.append(Clause(key, key_required=False, absent=True))
                continue
            merged.extend(cs)
        sel.clauses = merged


def parse(query: str) -> list[Selector]:
    return _Parser(_tokenize(query)).parse_query()
