"""Boolean query grammar -> AST, shared by the Spark query compiler and
the pure-Python oracle.

Grammar per /root/reference/queries/booleanqueryparser.py:134-192:
``+`` separates OR subqueries; whitespace inside a subquery is AND;
``-lit`` is NOT (negativity consumed by the enclosing AND);
``"a b c"`` is a phrase; ``[t1 NEAR/k t2]`` is proximity. A
single-literal subquery skips the AND wrapper; the whole query is
wrapped in OR only when there is more than one subquery.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Node:
    kind: str  # 'term' | 'phrase' | 'near' | 'not' | 'and' | 'or'
    term: str = ""
    children: list["Node"] = field(default_factory=list)
    k: int = 0
    is_negative: bool = False


def parse_boolean_query(query: str) -> Node | None:
    or_children: list[Node] = []
    for sub in query.split("+"):
        literals = _parse_subquery(sub)
        if not literals:
            continue
        if len(literals) == 1:
            or_children.append(literals[0])
        else:
            or_children.append(Node("and", children=literals))
    if not or_children:
        return None
    if len(or_children) == 1:
        return or_children[0]
    return Node("or", children=or_children)


def _parse_subquery(sub: str) -> list[Node]:
    literals: list[Node] = []
    i = 0
    n = len(sub)
    while i < n:
        if sub[i] == " ":
            i += 1
            continue
        negative = False
        if sub[i] == "-":
            negative = True
            i += 1
            while i < n and sub[i] == " ":
                i += 1
            if i >= n:
                break
        if sub[i] == "[":
            end = sub.find("]", i + 1)
            body = sub[i + 1 : end] if end >= 0 else sub[i + 1 :]
            i = (end + 1) if end >= 0 else n
            parts = body.split(" ")
            node = Node(
                "near",
                children=[Node("term", term=parts[0]), Node("term", term=parts[2])],
                k=int(parts[1].split("/")[1]),
            )
        elif sub[i] == '"':
            end = sub.find('"', i + 1)
            body = sub[i + 1 : end] if end >= 0 else sub[i + 1 :]
            i = (end + 1) if end >= 0 else n
            if not body:
                continue
            node = Node("phrase", term=body)
        else:
            end = sub.find(" ", i)
            if end < 0:
                end = n
            node = Node("term", term=sub[i:end])
            i = end
        if negative:
            node = Node("not", children=[node], is_negative=True)
        literals.append(node)
    return literals
