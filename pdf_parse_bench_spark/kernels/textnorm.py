"""String/scalar normalization kernels.

Reference semantics reproduced here:
  - M7 formula delimiter normalization   parsers/dots_ocr/__main__.py:35-57
  - F5 delimiter detect/strip/re-wrap    extraction/segment_extractor.py:378-381,515-527,596-602
  - F1 unicode→LaTeX sub/superscripts    utilities/formula_renderer.py:33-65
  - F2 escaped-char unescape             extraction/segment_extractor.py:654-657
  - F3 normalization for fuzzy matching  extraction/segment_extractor.py:660-661
  - J5 grouped-formula split             extraction/segment_extractor.py:433-604
"""

from __future__ import annotations

import re

# Ordered delimiter pairs, checked longest-first
# (extraction/segment_extractor.py:378-381).
DELIMITER_PAIRS = (("$$", "$$"), ("$", "$"), ("\\[", "\\]"), ("\\(", "\\)"))

_SUBSCRIPT_MAP = {
    "₀": "_0", "₁": "_1", "₂": "_2", "₃": "_3", "₄": "_4",
    "₅": "_5", "₆": "_6", "₇": "_7", "₈": "_8", "₉": "_9",
}
_SUPERSCRIPT_MAP = {
    "⁰": "^0", "¹": "^1", "²": "^2", "³": "^3", "⁴": "^4",
    "⁵": "^5", "⁶": "^6", "⁷": "^7", "⁸": "^8", "⁹": "^9",
}

# F1 long tail — the pylatexenc conversion surface the reference reaches
# through utilities/formula_renderer.py:47-61: Greek letters, math symbols
# and precomposed accented latin → deterministic LaTeX. Shared verbatim by
# the python kernel, the Spark expression chain
# (functions.preprocess_unicode_expr) and the DuckDB oracle — outputs are
# pure ASCII, so chain order is immaterial.
UNICODE_LATEX_MAP = {
    # Greek lowercase / uppercase (brace-wrapped so concatenation is safe)
    "α": "{\\alpha}", "β": "{\\beta}", "γ": "{\\gamma}", "δ": "{\\delta}",
    "ε": "{\\epsilon}", "ζ": "{\\zeta}", "η": "{\\eta}", "θ": "{\\theta}",
    "ι": "{\\iota}", "κ": "{\\kappa}", "λ": "{\\lambda}", "μ": "{\\mu}",
    "ν": "{\\nu}", "ξ": "{\\xi}", "π": "{\\pi}", "ρ": "{\\rho}",
    "σ": "{\\sigma}", "τ": "{\\tau}", "υ": "{\\upsilon}", "φ": "{\\phi}",
    "χ": "{\\chi}", "ψ": "{\\psi}", "ω": "{\\omega}",
    "Γ": "{\\Gamma}", "Δ": "{\\Delta}", "Θ": "{\\Theta}",
    "Λ": "{\\Lambda}", "Ξ": "{\\Xi}", "Π": "{\\Pi}", "Σ": "{\\Sigma}",
    "Υ": "{\\Upsilon}", "Φ": "{\\Phi}", "Ψ": "{\\Psi}", "Ω": "{\\Omega}",
    # math symbols
    "×": "{\\times}", "÷": "{\\div}", "±": "{\\pm}", "∓": "{\\mp}",
    "·": "{\\cdot}", "∞": "{\\infty}", "≤": "{\\leq}", "≥": "{\\geq}",
    "≠": "{\\neq}", "≈": "{\\approx}", "≡": "{\\equiv}",
    "∂": "{\\partial}", "∇": "{\\nabla}", "∑": "{\\sum}", "∏": "{\\prod}",
    "∫": "{\\int}", "√": "{\\surd}", "→": "{\\to}", "←": "{\\leftarrow}",
    "⇒": "{\\Rightarrow}", "⇐": "{\\Leftarrow}", "∈": "{\\in}",
    "∉": "{\\notin}", "⊆": "{\\subseteq}", "⊂": "{\\subset}",
    "∪": "{\\cup}", "∩": "{\\cap}", "∀": "{\\forall}",
    "∃": "{\\exists}", "∅": "{\\emptyset}",
    # precomposed accented latin (pylatexenc accent forms)
    "á": "\\'{a}", "à": "\\`{a}", "â": "\\^{a}", "ä": '\\"{a}',
    "é": "\\'{e}", "è": "\\`{e}", "ê": "\\^{e}", "ë": '\\"{e}',
    "í": "\\'{i}", "ì": "\\`{i}", "î": "\\^{i}", "ï": '\\"{i}',
    "ó": "\\'{o}", "ò": "\\`{o}", "ô": "\\^{o}", "ö": '\\"{o}',
    "ú": "\\'{u}", "ù": "\\`{u}", "û": "\\^{u}", "ü": '\\"{u}',
    "ñ": "\\~{n}", "ç": "\\c{c}",
    "É": "\\'{E}", "È": "\\`{E}", "Ü": '\\"{U}', "Ö": '\\"{O}',
    "Ä": '\\"{A}', "Ñ": "\\~{N}", "Ç": "\\c{C}",
    # Latin Extended-A/B precomposed (pylatexenc accent macro forms)
    "ā": "\\={a}", "ē": "\\={e}", "ī": "\\={i}", "ō": "\\={o}",
    "ū": "\\={u}", "ă": "\\u{a}", "ĕ": "\\u{e}", "ğ": "\\u{g}",
    "ą": "\\k{a}", "ę": "\\k{e}", "ć": "\\'{c}", "ń": "\\'{n}",
    "ś": "\\'{s}", "ź": "\\'{z}", "č": "\\v{c}", "ď": "\\v{d}",
    "ě": "\\v{e}", "ň": "\\v{n}", "ř": "\\v{r}", "š": "\\v{s}",
    "ť": "\\v{t}", "ž": "\\v{z}", "ż": "\\.{z}", "ő": "\\H{o}",
    "ű": "\\H{u}", "ů": "\\r{u}", "å": "\\r{a}", "Å": "\\r{A}",
    "ł": "{\\l}", "Ł": "{\\L}", "ø": "{\\o}", "Ø": "{\\O}",
    "æ": "{\\ae}", "Æ": "{\\AE}", "œ": "{\\oe}", "Œ": "{\\OE}",
    "ß": "{\\ss}", "ð": "{\\dh}", "þ": "{\\th}",
    "ý": "\\'{y}", "ÿ": '\\"{y}', "Š": "\\v{S}", "Č": "\\v{C}",
    "Ž": "\\v{Z}",
    # arrows
    "↑": "{\\uparrow}", "↓": "{\\downarrow}", "↔": "{\\leftrightarrow}",
    "⇑": "{\\Uparrow}", "⇓": "{\\Downarrow}", "⇔": "{\\Leftrightarrow}",
    "↦": "{\\mapsto}", "⟶": "{\\longrightarrow}",
    "⟵": "{\\longleftarrow}", "⇌": "{\\rightleftharpoons}",
    "↗": "{\\nearrow}", "↘": "{\\searrow}", "↪": "{\\hookrightarrow}",
    # relations / operators
    "≅": "{\\cong}", "≃": "{\\simeq}", "≪": "{\\ll}", "≫": "{\\gg}",
    "∝": "{\\propto}", "∼": "{\\sim}", "≲": "{\\lesssim}",
    "≳": "{\\gtrsim}", "≺": "{\\prec}", "≻": "{\\succ}",
    "⪯": "{\\preceq}", "⪰": "{\\succeq}", "⊇": "{\\supseteq}",
    "⊃": "{\\supset}", "⊕": "{\\oplus}", "⊗": "{\\otimes}",
    "⊖": "{\\ominus}", "⊙": "{\\odot}", "⊥": "{\\perp}",
    "∥": "{\\parallel}", "∧": "{\\wedge}", "∨": "{\\vee}",
    "¬": "{\\neg}", "⊢": "{\\vdash}", "⊨": "{\\models}",
    "∘": "{\\circ}", "∖": "{\\setminus}", "∠": "{\\angle}",
    "∴": "{\\therefore}", "∵": "{\\because}", "∗": "{\\ast}",
    # letterlike / misc
    "ℏ": "{\\hbar}", "ℓ": "{\\ell}", "℘": "{\\wp}", "ℜ": "{\\Re}",
    "ℑ": "{\\Im}", "ℵ": "{\\aleph}", "°": "{\\degree}",
    "′": "{\\prime}", "″": "{\\prime\\prime}", "…": "{\\ldots}",
    "⋯": "{\\cdots}", "⋮": "{\\vdots}", "⋱": "{\\ddots}",
    "⟨": "{\\langle}", "⟩": "{\\rangle}", "∣": "{\\mid}",
    "†": "{\\dagger}", "‡": "{\\ddagger}", "∄": "{\\nexists}",
    # ---- r4 long-tail completion (pylatexenc utf8 table remainder) ----
    # typographic punctuation / quotes / dashes
    "“": "``", "”": "''", "‘": "`", "’": "'",
    "‚": ",", "„": ",,",
    "«": "{\\guillemotleft}", "»": "{\\guillemotright}",
    "–": "{\\textendash}", "—": "{\\textemdash}",
    "•": "{\\textbullet}", "‰": "{\\textperthousand}",
    "¡": "{\\textexclamdown}", "¿": "{\\textquestiondown}",
    # currency / signs / fractions
    "€": "{\\texteuro}", "£": "{\\pounds}", "¥": "{\\textyen}",
    "¢": "{\\textcent}", "§": "{\\S}", "¶": "{\\P}",
    "©": "{\\copyright}", "®": "{\\textregistered}",
    "™": "{\\texttrademark}", "½": "{\\textonehalf}",
    "¼": "{\\textonequarter}", "¾": "{\\textthreequarters}",
    "ª": "{\\textordfeminine}", "º": "{\\textordmasculine}",
    "µ": "{\\mu}", "Ω": "{\\Omega}",  # micro / ohm compatibility signs
    # blackboard bold / calligraphic letterlike
    "ℝ": "{\\mathbb{R}}", "ℕ": "{\\mathbb{N}}", "ℤ": "{\\mathbb{Z}}",
    "ℚ": "{\\mathbb{Q}}", "ℂ": "{\\mathbb{C}}", "ℙ": "{\\mathbb{P}}",
    "ℍ": "{\\mathbb{H}}", "ℒ": "{\\mathcal{L}}", "ℱ": "{\\mathcal{F}}",
    "ℋ": "{\\mathcal{H}}", "ℰ": "{\\mathcal{E}}", "ℬ": "{\\mathcal{B}}",
    # negated relations
    "⊄": "{\\not\\subset}", "⊈": "{\\nsubseteq}", "⊊": "{\\subsetneq}",
    "⊋": "{\\supsetneq}", "≢": "{\\not\\equiv}", "≰": "{\\nleq}",
    "≱": "{\\ngeq}", "≮": "{\\nless}", "≯": "{\\ngtr}",
    "∤": "{\\nmid}", "∦": "{\\nparallel}", "≇": "{\\ncong}",
    # floors / ceilings
    "⌊": "{\\lfloor}", "⌋": "{\\rfloor}",
    "⌈": "{\\lceil}", "⌉": "{\\rceil}",
    # operators / big operators
    "∙": "{\\bullet}", "⋅": "{\\cdot}", "⊎": "{\\uplus}",
    "⊓": "{\\sqcap}", "⊔": "{\\sqcup}", "⊑": "{\\sqsubseteq}",
    "⊒": "{\\sqsupseteq}", "⋈": "{\\bowtie}", "⋆": "{\\star}",
    "⊲": "{\\lhd}", "⊳": "{\\rhd}", "≀": "{\\wr}",
    "⨁": "{\\bigoplus}", "⨂": "{\\bigotimes}", "⋃": "{\\bigcup}",
    "⋂": "{\\bigcap}", "∮": "{\\oint}", "∬": "{\\iint}",
    "∭": "{\\iiint}", "∐": "{\\coprod}",
    # arrows (second batch)
    "↩": "{\\hookleftarrow}", "⇀": "{\\rightharpoonup}",
    "↽": "{\\leftharpoondown}", "⟹": "{\\Longrightarrow}",
    "⟸": "{\\Longleftarrow}", "⟷": "{\\longleftrightarrow}",
    "⟺": "{\\Longleftrightarrow}", "↕": "{\\updownarrow}",
    "⇕": "{\\Updownarrow}", "↖": "{\\nwarrow}", "↙": "{\\swarrow}",
    # Greek variant forms
    "ϑ": "{\\vartheta}", "ϕ": "{\\varphi}", "ϖ": "{\\varpi}",
    "ϱ": "{\\varrho}", "ς": "{\\varsigma}", "ϰ": "{\\varkappa}",
    "ϵ": "{\\epsilon}", "∊": "{\\in}", "∋": "{\\ni}",
    # geometric shapes / dingbats / music
    "★": "{\\bigstar}", "■": "{\\blacksquare}", "□": "{\\square}",
    "▲": "{\\blacktriangle}", "△": "{\\triangle}",
    "▽": "{\\triangledown}", "◆": "{\\blacklozenge}",
    "◇": "{\\lozenge}", "○": "{\\bigcirc}", "✓": "{\\checkmark}",
    "✠": "{\\maltese}", "♠": "{\\spadesuit}", "♡": "{\\heartsuit}",
    "♢": "{\\diamondsuit}", "♣": "{\\clubsuit}",
    "♭": "{\\flat}", "♮": "{\\natural}", "♯": "{\\sharp}",
    # Latin Extended completion (accent-macro + special-letter forms)
    "ã": "\\~{a}", "õ": "\\~{o}", "ĩ": "\\~{i}", "ũ": "\\~{u}",
    "Ã": "\\~{A}", "Õ": "\\~{O}",
    "Á": "\\'{A}", "À": "\\`{A}", "Â": "\\^{A}", "Ê": "\\^{E}",
    "Ë": '\\"{E}', "Í": "\\'{I}", "Ì": "\\`{I}", "Î": "\\^{I}",
    "Ï": '\\"{I}', "Ó": "\\'{O}", "Ò": "\\`{O}", "Ô": "\\^{O}",
    "Ú": "\\'{U}", "Ù": "\\`{U}", "Û": "\\^{U}", "Ý": "\\'{Y}",
    "ĝ": "\\^{g}", "ĥ": "\\^{h}", "ĵ": "\\^{j}", "ŝ": "\\^{s}",
    "ŵ": "\\^{w}", "ŷ": "\\^{y}", "ė": "\\.{e}", "ċ": "\\.{c}",
    "ġ": "\\.{g}", "İ": "\\.{I}", "ı": "{\\i}",
    "ģ": "\\c{g}", "ķ": "\\c{k}", "ļ": "\\c{l}", "ņ": "\\c{n}",
    "ŗ": "\\c{r}", "ş": "\\c{s}", "ţ": "\\c{t}",
    "ĺ": "\\'{l}", "ŕ": "\\'{r}", "ǎ": "\\v{a}", "ǐ": "\\v{i}",
    "ǒ": "\\v{o}", "ǔ": "\\v{u}", "ȳ": "\\={y}",
    "ǫ": "\\k{o}", "ų": "\\k{u}", "į": "\\k{i}",
    "đ": "{\\dj}", "Đ": "{\\DJ}", "ŋ": "{\\ng}", "Ŋ": "{\\NG}",
    # sub/superscript letters (digit maps live in _SUB/_SUP)
    "ⁿ": "^n", "ⁱ": "^i", "ₐ": "_a", "ₑ": "_e", "ₒ": "_o",
    "ₓ": "_x", "ₖ": "_k", "ₘ": "_m", "ₙ": "_n", "ₚ": "_p", "ₜ": "_t",
}

# combining accents: the mark FOLLOWS its ASCII base, so these need a
# capture-group regex ((base)mark -> \<acc>{base}), not a plain replace
COMBINING_LATEX = {
    "́": "'", "̀": "`", "̂": "^", "̃": "~",
    "̈": '"', "̄": "=", "̌": "v",
}

_WS_BACKSLASH_RE = re.compile(r"[\s\\]+")
_ESCAPED_NL_RE = re.compile(r"\\n(?![a-zA-Z])")
_ESCAPED_TAB_RE = re.compile(r"\\t(?![a-zA-Z])")

_ALIGNED_ENV_RE = re.compile(
    r"^\\begin\{(aligned|gathered|align\*?|gather\*?)\}(.*)\\end\{\1\}$", re.S
)


def strip_delimiters(text: str) -> tuple[str, str, str]:
    """Return (open, inner, close); empty delimiters if none matched."""
    for o, c in DELIMITER_PAIRS:
        if text.startswith(o) and text.endswith(c) and len(text) >= len(o) + len(c):
            return o, text[len(o):len(text) - len(c)], c
    return "", text, ""


def normalize_display_formula(raw: str) -> str:
    """Canonicalize a display-math block to ``$$<content>$$``.

    Accepts ``$$..$$`` and ``\\[..\\]`` with arbitrary inner padding
    (M7: parsers/dots_ocr/__main__.py:44-53).
    """
    s = raw.strip()
    if s.startswith("\\[") and s.endswith("\\]"):
        inner = s[2:-2]
    elif s.startswith("$$") and s.endswith("$$"):
        inner = s[2:-2]
    else:
        inner = s
    return "$$" + inner.strip() + "$$"


def split_grouped_formula(content: str) -> list[str]:
    r"""Deterministic replacement for the reference's LLM grouped-formula
    split (segment_extractor.py:493-604): strip an aligned/gathered env if
    present, then split on ``\\`` row separators, preserving order."""
    c = content.strip()
    m = _ALIGNED_ENV_RE.match(c)
    if m:
        c = m.group(2).strip()
    parts = [p.strip() for p in c.split("\\\\")]
    return [p for p in parts if p]


def preprocess_unicode(text: str) -> str:
    """Unicode → LaTeX (formula_renderer.py:33-65): sub/superscript digit
    maps (:38-46) plus the pylatexenc long tail (:47-61) — Greek, math
    symbols, precomposed accents, and combining accents on ASCII bases."""
    for k, v in _SUBSCRIPT_MAP.items():
        text = text.replace(k, v)
    for k, v in _SUPERSCRIPT_MAP.items():
        text = text.replace(k, v)
    for k, v in UNICODE_LATEX_MAP.items():
        text = text.replace(k, v)
    for mark, acc in COMBINING_LATEX.items():
        text = re.sub(f"([A-Za-z]){mark}", f"\\\\{acc}{{\\1}}", text)
    return text


def unescape_control(text: str) -> str:
    r"""Unescape ``\n``/``\t`` unless a LaTeX command follows
    (negative lookahead, segment_extractor.py:654-657)."""
    return _ESCAPED_TAB_RE.sub("\t", _ESCAPED_NL_RE.sub("\n", text))


def normalize_for_matching(text: str) -> str:
    """Strip all whitespace and backslashes (segment_extractor.py:660-661)."""
    return _WS_BACKSLASH_RE.sub("", text)


def formula_delimiter_bonus(text: str) -> float:
    """Boundary-refinement bonus for intact delimiters
    (segment_extractor.py:609-625): +2.5 for $$/\\[..\\], +1.5 for $/\\(..\\)."""
    s = text.strip()
    if (s.startswith("$$") and s.endswith("$$") and len(s) >= 4) or (
        s.startswith("\\[") and s.endswith("\\]")
    ):
        return 2.5
    if (s.startswith("$") and s.endswith("$") and len(s) >= 2) or (
        s.startswith("\\(") and s.endswith("\\)")
    ):
        return 1.5
    return 0.0


def parse_score(text: str) -> int:
    """First integer in a judge response, clamped to [0, 10]
    (eval/llm_judge.py:133-140, :202)."""
    m = re.search(r"-?\d+", text)
    if not m:
        return 0
    return max(0, min(10, int(m.group())))
