"""BCP-47 language-tag validation.

Same grammar as the reference (``Parsing/LanguageTag.cs:8-41``), which in
turn uses the well-known BCP-47 regex (grandfathered / private-use /
extension productions included).
"""

from __future__ import annotations

import re

_REGULAR = r"(art-lojban|cel-gaulish|no-bok|no-nyn|zh-guoyu|zh-hakka|zh-min|zh-min-nan|zh-xiang)"
_IRREGULAR = (
    r"(en-GB-oed|i-ami|i-bnn|i-default|i-enochian|i-hak|i-klingon|i-lux|i-mingo|"
    r"i-navajo|i-pwn|i-tao|i-tay|i-tsu|sgn-BE-FR|sgn-BE-NL|sgn-CH-DE)"
)
_GRANDFATHERED = f"({_IRREGULAR}|{_REGULAR})"
_PRIVATE_USE = r"(x(-[A-Za-z0-9]{1,8})+)"
_SINGLETON = r"[0-9A-WY-Za-wy-z]"
_EXTENSION = f"({_SINGLETON}(-[A-Za-z0-9]{{2,8}})+)"
_VARIANT = r"([A-Za-z0-9]{5,8}|[0-9][A-Za-z0-9]{3})"
_REGION = r"([A-Za-z]{2}|[0-9]{3})"
_SCRIPT = r"([A-Za-z]{4})"
_EXTLANG = r"([A-Za-z]{3}(-[A-Za-z]{3}){0,2})"
_LANGUAGE = f"(([A-Za-z]{{2,3}}(-{_EXTLANG})?)|[A-Za-z]{{4}}|[A-Za-z]{{5,8}})"
_LANGTAG = f"({_LANGUAGE}(-{_SCRIPT})?(-{_REGION})?(-{_VARIANT})*(-{_EXTENSION})*(-{_PRIVATE_USE})?)"
_LANGUAGE_TAG_RE = re.compile(f"^({_GRANDFATHERED}|{_LANGTAG}|{_PRIVATE_USE})$")


def is_valid_language_tag(tag: str) -> bool:
    return bool(_LANGUAGE_TAG_RE.match(tag))
