"""Differential test: the fast regex tokenizer must convert every document
identically to the HTMLParser fallback path (it aborts to the fallback on
anything it cannot replicate bit-for-bit)."""

import random

import pytest

import html2text_spark.core.converter as C
from html2text_spark.core.config import Config
from html2text_spark.fixtures import ERROR_FIXTURES, iter_fixtures


def _both_paths(html, cfg=None):
    fast = C.convert(html, cfg)
    C._FORCE_FALLBACK = True
    try:
        slow = C.convert(html, cfg)
    finally:
        C._FORCE_FALLBACK = False
    return fast, slow


def test_fixture_corpus_differential():
    for name, html, _expected, cfg in iter_fixtures():
        if name in ERROR_FIXTURES:
            continue
        fast, slow = _both_paths(html, cfg)
        assert fast == slow, f"fast/slow divergence on fixture {name}"


_TAGS = ["p", "div", "b", "i", "em", "span", "ul", "li", "ol", "pre", "code",
         "blockquote", "h1", "h2", "table", "tr", "td", "a", "q", "abbr"]
_WORDS = ["alpha", "beta", "gamma", "x<y", "a&b", "&amp;", "&#65;", "&bogus;",
          "tail  space", "nb sp", "-dash-", "1. list", "* star",
          "<!-->", "<!--->", "<![CDATA[z]]>", "<!doctype html>", "<?pi?>",
          "</stray>", "<", "< notatag", "a=b",
          "&Delta;", "&Aacute;", "&THORN;x", "<a href>v</a>",
          "<abbr title>T</abbr>", "<td nowrap>c</td>",
          # sentinel-literal injection: must round-trip, not decode
          "__PH2T__", "__PH2T__ENT_amp__", "__PH2T__CHAR_65__",
          "__PH2T__RAW_x__", "x__PH2T__y"]


def _random_html(rng: random.Random, depth: int = 0) -> str:
    parts = []
    for _ in range(rng.randint(1, 6)):
        roll = rng.random()
        if roll < 0.4 or depth > 3:
            parts.append(rng.choice(_WORDS))
        elif roll < 0.5:
            parts.append("<!-- %s -->" % rng.choice(_WORDS))
        elif roll < 0.55:
            parts.append("<br/>")
        elif roll < 0.6:
            src = "img%d.png" % rng.randint(0, 9)
            parts.append('<img src="%s" alt="a%d">' % (src, rng.randint(0, 9)))
        else:
            tag = rng.choice(_TAGS)
            attrs = ""
            if tag == "a":
                attrs = ' href="http://e.com/%d"' % rng.randint(0, 99)
            elif rng.random() < 0.3:
                attrs = " class=c%d style='color: red'" % rng.randint(0, 3)
            inner = _random_html(rng, depth + 1)
            closer = "</%s>" % tag if rng.random() < 0.9 else ""  # broken nesting
            parts.append("<%s%s>%s%s" % (tag, attrs, inner, closer))
    return " ".join(parts)


@pytest.mark.parametrize("seed", range(150))
def test_random_differential(seed):
    rng = random.Random(seed)
    html = _random_html(rng)
    fast, slow = _both_paths(html)
    assert fast == slow, f"divergence seed={seed}\nhtml={html!r}"


def _both_span_paths(spans, cfg=None):
    fast = C.convert_spans(spans, cfg)
    C._FORCE_FALLBACK = True
    try:
        slow = C.convert_spans(spans, cfg)
    finally:
        C._FORCE_FALLBACK = False
    return fast, slow


@pytest.mark.parametrize("seed", range(150))
def test_random_differential_interleaved_spans(seed):
    """Multi-fragment (html-media-html) documents take the per-fragment
    fast dispatch when every fragment is eligible; the event stream must
    equal HTMLParser's incremental feed across media boundaries."""
    rng = random.Random(1000 + seed)
    spans = []
    offset = 0
    for _ in range(rng.randint(2, 5)):
        spans.append(("html", _random_html(rng), ""))
        if rng.random() < 0.7:
            spans.append(("media", "", f"asset://{rng.randint(0, 99)}"))
        offset += 1
    fast, slow = _both_span_paths(spans)
    assert fast == slow, f"divergence seed={seed}\nspans={spans!r}"


try:
    from hypothesis import given, settings, strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:
    _soup_alphabet = st.sampled_from(
        list("<>&;/= \n\t\"'") + ["p", "b", "a", "em", "pre", "li", "ul",
                                  "img", "x", "y", "amp", "#65", "--", "!",
                                  "__PH2T__", "href", "src"]
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(_soup_alphabet, min_size=0, max_size=40))
    def test_hypothesis_soup_differential(parts):
        """Pathological tag soup: fast path and HTMLParser fallback must
        convert identically (hypothesis shrinks any divergence to a
        minimal reproducer)."""
        html = "".join(parts)
        fast, slow = _both_paths(html)
        assert fast == slow, f"divergence on {html!r}"

    @settings(max_examples=150, deadline=None)
    @given(st.lists(_soup_alphabet, min_size=0, max_size=24), st.integers(1, 20))
    def test_hypothesis_soup_spans_differential(parts, split):
        """Same soup split across a media boundary: per-fragment dispatch
        vs incremental HTMLParser feed."""
        html = "".join(parts)
        cut = min(split, len(html))
        spans = [
            ("html", html[:cut], ""),
            ("media", "", "asset://h"),
            ("html", html[cut:], ""),
        ]
        fast, slow = _both_span_paths(spans)
        assert fast == slow, f"divergence on {html!r} split at {cut}"


def test_interleaved_mid_tag_fragment_falls_back():
    """A tag split across a media boundary must take the HTMLParser
    incremental path and still parse (buffered across fragments)."""
    spans = [
        ("html", "<p>before <b", ""),
        ("media", "", "asset://1"),
        ("html", ">bold</b> after</p>", ""),
    ]
    fast, slow = _both_span_paths(spans)
    assert fast == slow
    text = "".join(t for k, t, _ in fast if k == "text")
    assert "bold" in text and "after" in text


@pytest.mark.parametrize(
    "html",
    [
        "<p>no tags at all",
        "plain text only",
        "<SCRIPT>var x = 1;</SCRIPT>after",
        "<script>if (a < b) {}</script>after",  # '<' in script -> fallback
        "<style>p { color: red }</style><p class=x>body</p>",
        "<p>unterminated <b>bold",
        "<div><p>a</div></p>",
        "<p>a<p>b<p>c",
        "<td>stray</td>",
        "<!DOCTYPE html><html><body><p>hi</p></body></html>",
        "<?php echo 1; ?><p>x</p>",
        "<p>a < b and c > d</p>",
        "<img src=unquoted/ alt=x><p>after</p>",
        "<p attr='val>with gt'>t</p>",
        "<a href='x'><h2>header in link</h2></a>",
    ],
)
def test_tricky_cases_differential(html):
    fast, slow = _both_paths(html)
    assert fast == slow


def test_fast_path_actually_taken():
    events = C._fast_tokenize("<p>hello <b>world</b></p>")
    assert events is not None
    kinds = [e[0] for e in events]
    assert kinds == ["start", "data", "start", "data", "end", "end"]


def test_fallback_on_residual_ampersand():
    assert C._fast_tokenize("<p>a & b</p>") is None


def test_fallback_on_cdata_section():
    assert C._fast_tokenize("<p><![CDATA[x]]></p>") is None


# ----------------------------------------------------------------------
# fast wrapper differential (vs textwrap)
# ----------------------------------------------------------------------

import textwrap

from hypothesis import given, settings, strategies as st

_word = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Po")),
    min_size=1,
    max_size=14,
).filter(lambda w: "-" not in w and not w.isspace())


@settings(max_examples=300, deadline=None)
@given(
    words=st.lists(_word, min_size=1, max_size=40),
    width=st.integers(min_value=4, max_value=80),
    indent=st.sampled_from(["", "    ", "> "]),
)
def test_fast_wrap_matches_textwrap(words, width, indent):
    para = " ".join(words)
    if para != para.strip() or "  " in para or "-" in para:
        return
    expected = textwrap.wrap(
        para, width, break_long_words=False, subsequent_indent=indent
    )
    assert C._fast_wrap(para, width, indent) == expected, (para, width, indent)


def test_wrap_para_dispatches_hyphens_to_textwrap():
    # hyphenated text must take the textwrap path (hyphen-aware breaks)
    para = "a long hyphen-separated-word sequence " * 4
    out = C._wrap_para(para.strip(), 20, "")
    expected = textwrap.wrap(
        para.strip(), 20, break_long_words=False, subsequent_indent=""
    )
    assert out == expected
