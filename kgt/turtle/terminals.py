"""Turtle lexer terminals as Python regexes.

Transcribed from the W3C Turtle grammar (etc/turtle.bnf in the reference;
productions 18, 19-25, 26, 139s-172s) with the same character ranges the
reference registers (/root/reference/lib/rdf/turtle/terminals.rb:9-74).
Python `re` handles the astral-plane ranges natively.

The combined scanner lives in kgt.turtle.lexer; terminal ORDER there is
load-bearing (first match wins, mirroring the reference's ordered terminal
table at lib/rdf/turtle/reader.rb:14-39).
"""

# --- character classes -------------------------------------------------
# PN_CHARS_BASE (163s)
_PN_CHARS_BASE = (
    "A-Za-z"
    "\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF"
    "\u0370-\u037D\u037F-\u1FFF\u200C-\u200D"
    "\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF"
    "\uF900-\uFDCF\uFDF0-\uFFFD"
    "\U00010000-\U000EFFFF"
)
# PN_CHARS_U (164s) = PN_CHARS_BASE | "_"
_PN_CHARS_U = _PN_CHARS_BASE + "_"
# PN_CHARS (166s) = PN_CHARS_U | "-" | [0-9] | U_CHARS2
_U_CHARS2 = "\u00B7\u0300-\u036F\u203F-\u2040"
_PN_CHARS = _PN_CHARS_U + "\\-0-9" + _U_CHARS2

PN_CHARS_BASE_CLS = f"[{_PN_CHARS_BASE}]"
PN_CHARS_U_CLS = f"[{_PN_CHARS_U}]"
PN_CHARS_CLS = f"[{_PN_CHARS}]"

# --- escapes -----------------------------------------------------------
UCHAR = r"\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}"          # (26)
ECHAR = r"\\[tbnrf\\\"']"                                # (159s)
PERCENT = r"%[0-9A-Fa-f]{2}"                             # (170s)
PN_LOCAL_ESC = r"\\[_~.\-!$&'()*+,;=/?#@%]"              # (172s)
PLX = f"(?:{PERCENT}|{PN_LOCAL_ESC})"                    # (169s)

# --- names -------------------------------------------------------------
# PN_PREFIX (167s): PN_CHARS_BASE ((PN_CHARS | '.')* PN_CHARS)?
PN_PREFIX = f"{PN_CHARS_BASE_CLS}(?:(?:\\.|{PN_CHARS_CLS})*{PN_CHARS_CLS})?"
# PN_LOCAL (168s): (PN_CHARS_U | ':' | [0-9] | PLX) ((PN_CHARS|'.'|':'|PLX)* (PN_CHARS|':'|PLX))?
PN_LOCAL = (
    f"(?:[{_PN_CHARS_U}0-9:]|{PLX})"
    f"(?:(?:[{_PN_CHARS}.:]|{PLX})*(?:[{_PN_CHARS}:]|{PLX}))?"
)
PNAME_NS = f"(?:{PN_PREFIX})?:"                          # (139s)
PNAME_LN = f"{PNAME_NS}{PN_LOCAL}"                       # (140s)
# BLANK_NODE_LABEL (141s)
BLANK_NODE_LABEL = (
    f"_:[{_PN_CHARS_U}0-9]"
    f"(?:(?:{PN_CHARS_CLS}|\\.)*{PN_CHARS_CLS})?"
)

# --- IRIs --------------------------------------------------------------
# IRI_RANGE: anything but <>"{}|^`\ and control chars <= 0x20
IRI_RANGE = r'[^<>"{}|^`\\\x00-\x20]'
IRIREF = f"<(?:{IRI_RANGE}|{UCHAR})*>"                   # (18)

# --- numbers -----------------------------------------------------------
EXPONENT = r"[eE][+-]?[0-9]+"                            # (154s)
INTEGER = r"[+-]?[0-9]+"                                 # (19)
DECIMAL = r"[+-]?[0-9]*\.[0-9]+"                         # (20)
DOUBLE = (
    rf"[+-]?(?:[0-9]+\.[0-9]*(?:{EXPONENT})|\.?[0-9]+(?:{EXPONENT}))"
)                                                        # (21)

# --- strings (22-25) ---------------------------------------------------
STRING_LITERAL_QUOTE = rf'"(?:[^"\\\n\r]|{ECHAR}|{UCHAR})*"'
STRING_LITERAL_SINGLE_QUOTE = rf"'(?:[^'\\\n\r]|{ECHAR}|{UCHAR})*'"
STRING_LITERAL_LONG_QUOTE = rf'"""(?:(?:"|"")?(?:[^"\\]|{ECHAR}|{UCHAR}))*"""'
STRING_LITERAL_LONG_SINGLE_QUOTE = rf"'''(?:(?:'|'')?(?:[^'\\]|{ECHAR}|{UCHAR}))*'''"

# --- misc --------------------------------------------------------------
# ASCII whitespace ONLY: the reference's Ruby \s (terminals.rb:68) is
# ASCII [ \t\n\v\f\r]; Python's \s is Unicode-aware and would accept
# NEL/NBSP/U+2028 etc. as token separators the reference rejects
# (round-6 review find — parity break, malformed docs parsed clean)
_WS_CHAR = r"[ \t\n\v\f\r]"
WS = rf"(?:{_WS_CHAR}|#[^\n\r]*)+"                       # (161s) incl. comments
ANON = rf"\[(?:{_WS_CHAR}|#[^\n\r]*)*\]"                 # (162s)
LANG_DIR = r"@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*(?:--[a-zA-Z]+)?"  # (144s)
PREFIX_KW = r"@?[Pp][Rr][Ee][Ff][Ii][Xx]"                # (28t) case-insensitive
BASE_KW = r"@?[Bb][Aa][Ss][Ee]"                          # (29t)
# punctuation / string terminals (reader.rb:28-35): single chars, ^^, {| |}, true/false, << >>
PUNCT = r"<<|>>|\^\^|\{\||\|\}|true|false|[(),.;\[\]Aa]"
