"""HTML -> markdown span extraction: a single-pass tokenizer + tag-stack
state machine.

This is a fresh, idiomatic-Python implementation of the computation performed
by the reference (ineersa/html2text).  Parity targets, cited per behavior:

  * tag dispatch           /root/reference/src/Processors/TagProcessor.php:60-545
  * output state machine   /root/reference/src/DataContainer.php:74-407
  * text pipeline          /root/reference/src/Processors/TextProcessor.php:23-152
  * entity pre-pass        /root/reference/src/HTML2Markdown.php:147-164
  * wrap pass              /root/reference/src/Processors/WrapProcessor.php:22-127

Architectural note (why this is NOT a port): the reference parses with a
repairing DOM (libxml HTML5) and then runs three regex pre-scans
(TrProcessor, AnchorUtilities, ListProcessor) purely to *undo* the DOM's
auto-repair so its event stream matches a raw tokenizer.  We tokenize with
``html.parser.HTMLParser`` directly, so the raw event stream is native and
the entire pre-scan/depth-repair machinery disappears.  Malformed HTML never
raises: the tokenizer simply emits the events as written.

Entities are rewritten to inert placeholder tokens before tokenization
(``__PH2T__ENT_x__`` / ``__PH2T__CHAR_x__``) so HTMLParser's attribute
unescaping can't bypass the unifiable/charref tables; the text pipeline
decodes them with full WHATWG control-character remapping.

The converter is instantiated once per document inside a vectorized Arrow
batch loop -- state never crosses rows, so documents are embarrassingly
parallel (see html2text_spark.pipeline).
"""

from __future__ import annotations

import html.entities
import re
import textwrap
from dataclasses import dataclass
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

from . import constants, utils
from .config import Config
from .urljoin import url_join

_PLACEHOLDER_RE = re.compile(r"__PH2T__(CHAR|ENT|RAW)_([^_]+(?:_[^_]+)*?)__")
_ENTITY_RE = re.compile(r"&(#[xX][0-9A-Fa-f]+|#[0-9]+|[A-Za-z][A-Za-z0-9]+);")
# ASCII whitespace only, matching the reference's non-unicode /\s+/
# (src/DataContainer.php:157)
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")
# collapse is only needed for a double space or a non-space ws char (a
# lone single space is already collapsed); one C-level scan beats the
# per-call genexpr this replaced in the o() hot path
_WS_GUARD_RE = re.compile(r"[\t\n\r\f\v]|  ")

#: push()'s stressed-boundary test, precompiled (re.match with a literal
#: pattern pays the pattern-cache lookup on every stressed-adjacent run)
_STRESSED_BOUNDARY_RE = re.compile(r"[^\[\](){}\s.!?]")

#: shared read-only empty style dict (see handle_tag)
_EMPTY_STYLE: Dict[str, str] = {}

#: tags with dedicated dispatch blocks in handle_tag; any other tag is a
#: pass-through (outside googleDoc mode) and can exit the dispatch early
_HANDLED_TAGS = frozenset(
    "p div br hr head style script body blockquote em i u strong b del "
    "strike s kbd code tt abbr q a img dl dt dd ol ul li table tr td th "
    "pre sup sub".split()
) | frozenset("h%d" % i for i in range(1, 10))


# ----------------------------------------------------------------------
# fast tokenizer (regex) with strict eligibility + HTMLParser fallback
# ----------------------------------------------------------------------
#
# html.parser.HTMLParser costs ~25us per tag in pure-Python dispatch.  The
# common case -- well-formed markup with no residual entities after the
# placeholder pre-pass -- can be tokenized ~4x faster with one compiled
# regex.  Eligibility is checked strictly; ANY construct whose HTMLParser
# semantics we do not replicate bit-for-bit (residual '&', CDATA sections,
# unmatched '<', script/style bodies containing '<', exotic tag syntax)
# aborts to the HTMLParser path for the whole document.  A differential
# fuzz test (tests/test_fast_tokenizer.py) asserts both paths convert
# identically on generated and fixture corpora.

_FAST_TAG_RE = re.compile(
    r"""<(?:
          (?P<end>/)\s*(?P<ename>[a-zA-Z][a-zA-Z0-9:_.-]*)\s*>
        | (?P<name>[a-zA-Z][a-zA-Z0-9:_.-]*)
          (?P<attrs>(?:\s+[^\s/>=]+(?:\s*=\s*(?:"[^"]*"|'[^']*'|[^\s>]+))?)*)
          \s*(?P<selfclose>/?)>
        | !--(?P<comment>.*?)--\s*>
        | !(?P<decl>[^>]*)>
        | \?(?P<pi>[^>]*)>
        )""",
    re.VERBOSE | re.DOTALL,
)

_FAST_ATTR_RE = re.compile(
    r"""([^\s/>=]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]+))?"""
)

_CDATA_ELEMS = ("script", "style")


def _fast_tokenize(html_text: str) -> Optional[list]:
    """Tokenize into [(kind, payload)] events identical to HTMLParser's,
    or None if the document is not eligible for the fast path."""
    if "&" in html_text or "<![" in html_text:
        return None
    events: list = []
    pos = 0
    n = len(html_text)
    lower_cache: Optional[str] = None
    while True:
        lt = html_text.find("<", pos)
        if lt == -1:
            if pos < n:
                events.append(("data", html_text[pos:]))
            return events
        if lt > pos:
            events.append(("data", html_text[pos:lt]))
        m = _FAST_TAG_RE.match(html_text, lt)
        if m is None:
            return None  # exotic construct: let HTMLParser decide
        pos = m.end()
        # one groups() call instead of up to 8 group() calls per tag --
        # this loop runs once per tag of every eligible document
        end, ename, name, raw_attrs, selfclose, comment, decl, pi = m.groups()
        if decl is not None and decl.startswith("--"):
            # '<!--' without a well-formed '-->' (e.g. '<!-->'): HTMLParser
            # treats these as unterminated-comment lookalikes with their
            # own recovery rules -- fall back rather than guess
            return None
        if comment is not None or decl is not None or pi is not None:
            continue  # dropped, like handle_comment/decl/pi
        if end:
            events.append(("end", ename.lower()))
            continue
        name = name.lower()
        if raw_attrs:
            attrs = _FAST_ATTR_RE.findall(raw_attrs)
            attrs = [
                (k, v[1:-1] if v[:1] in ('"', "'") else (v if v else None))
                for k, v in attrs
            ]
        else:
            attrs = []
        events.append(("start", name, attrs))
        if selfclose:
            events.append(("end", name))
            continue
        if name in _CDATA_ELEMS:
            # replicate HTMLParser CDATA mode only for the simple case:
            # raw content with no '<' up to the matching close tag
            if lower_cache is None:
                lower_cache = html_text.lower()
            close = lower_cache.find("</" + name, pos)
            if close == -1:
                return None  # unterminated: fall back
            content = html_text[pos:close]
            if "<" in content:
                return None
            m2 = _FAST_TAG_RE.match(html_text, close)
            if m2 is None or not m2.group("end") \
                    or m2.group("ename").lower() != name:
                return None
            if content:
                events.append(("data", content))
            events.append(("end", name))
            pos = m2.end()


def _preprocess_entities(html_text: str) -> str:
    """Rewrite &ent;/&#nnn; to inert placeholder tokens pre-tokenization."""

    def repl(match: re.Match) -> str:
        entity = match.group(1)
        if entity[0] == "#":
            return "__PH2T__CHAR_" + entity[1:].lower() + "__"
        # NB: HTML5 entity names are case-sensitive (&Delta; != &delta;);
        # the PHP reference lowercases here, corrupting uppercase-named
        # entities -- no golden fixture distinguishes, so we keep the
        # spec-correct (and upstream-Python) behavior
        return "__PH2T__ENT_" + entity + "__"

    # fast path: no '&' means _ENTITY_RE cannot match and no sentinel
    # means the self-encode below is a no-op -- skip both scans (runs
    # once per html fragment of every document)
    if "&" not in html_text:
        if "__PH2T__" not in html_text:
            return html_text
        return html_text.replace("__PH2T__", "__PH2T__RAW_x__")
    # input text that literally contains the sentinel (adversarial or
    # unlucky documents) must survive the round trip: self-encode it as a
    # RAW placeholder BEFORE generating real ones, decoded back verbatim
    if "__PH2T__" in html_text:
        html_text = html_text.replace("__PH2T__", "__PH2T__RAW_x__")
    return _ENTITY_RE.sub(repl, html_text)


@dataclass
class AnchorElement:
    attrs: Dict[str, Optional[str]]
    count: int
    outcount: int


@dataclass
class ListElement:
    name: str
    num: int


@dataclass
class MediaRef:
    """A media asset surfaced in document order (img src or passthrough)."""

    media_ref: str
    segment: int  # index of the html segment it was found in


class _Parser(HTMLParser):
    """Tokenizer + state machine.  One instance per document."""

    def __init__(self, cfg: Config):
        super().__init__(convert_charrefs=False)
        self.cfg = cfg

        # --- output buffer state (reference DataContainer) ---
        self.outtextlist: List[str] = []
        self.quiet = 0
        self.p_p = 0  # number of newlines to print before next output
        self.space = False
        self.last_was_nl = False
        self.start = True
        self.blockquote = 0
        self.pre = False
        self.startpre = False
        self.code = False
        self.br_toggle = ""
        self.lst: List[ListElement] = []
        self.list_code_indent = ""
        self.pre_indent = ""
        self.abbr_data: Optional[str] = None
        self.abbr_list: Dict[str, str] = {}
        self.maybe_automatic_link: Optional[str] = None
        self.empty_link = False
        self.a: List[AnchorElement] = []
        self.acount = 0
        self.outcount = 0
        self.emphasis = 0
        self.drop_white_space = 0
        self.style = 0
        self.style_def: Dict[str, Dict[str, str]] = {}
        self.stressed = False
        self.preceding_stressed = False
        self.preceding_data = ""
        self.current_tag = ""

        # --- tag dispatch state (reference TagProcessor) ---
        self.tag_stack: List[Tuple[str, dict, dict]] = []
        self.tag_style: Dict[str, str] = {}
        self.parent_style: Dict[str, str] = {}
        self.astack: List[Optional[dict]] = []
        self.inheader = False
        self.split_next_td = False
        self.abbr_title: Optional[str] = None
        self.quote = False
        self.last_was_list = False
        self.table_start = False
        self.td_count = 0

        # --- media span tracking (graft addition) ---
        self.media_refs: List[MediaRef] = []
        self.segment = 0

    # ------------------------------------------------------------------
    # tokenizer event entry points
    # ------------------------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        self.handle_tag(tag, self._attr_dict(attrs), start=True)

    def handle_endtag(self, tag: str) -> None:
        self.handle_tag(tag, {}, start=False)

    # handle_startendtag default = starttag + endtag, matching the
    # reference's paired DOM events for explicitly self-closed tags.

    def _attr_dict(self, attrs) -> Dict[str, Optional[str]]:
        # first occurrence wins, like the reference's DOM attribute map
        out: Dict[str, Optional[str]] = {}
        for name, value in attrs:
            name = name.lower()
            if name not in out:
                out[name] = self._decode_attr(value)
        return out

    def _decode_attr(self, value: Optional[str]) -> Optional[str]:
        if not value:
            return value
        if "__PH2T__" not in value:  # fast path: no entities in the value
            return self._normalize_plain_text(value)
        result: List[str] = []
        pos = 0
        for m in _PLACEHOLDER_RE.finditer(value):
            if m.start() > pos:
                result.append(value[pos : m.start()])
            result.append(self._convert_placeholder(m.group(1), m.group(2)))
            pos = m.end()
        result.append(value[pos:])
        return self._normalize_plain_text("".join(result))

    def handle_data(self, data: str) -> None:
        if "__PH2T__" not in data:  # fast path: no entities in this run
            self.push(self._normalize_plain_text(data))
            return
        pos = 0
        for m in _PLACEHOLDER_RE.finditer(data):
            if m.start() > pos:
                self.push(self._normalize_plain_text(data[pos : m.start()]))
            converted = self._convert_placeholder(m.group(1), m.group(2))
            if converted:
                # a restored RAW literal is ordinary text, not an entity:
                # it must take the normal escape_md path
                self.push(converted, entity_char=(m.group(1) != "RAW"))
            pos = m.end()
        if pos < len(data):
            self.push(self._normalize_plain_text(data[pos:]))

    def handle_entityref(self, name: str) -> None:
        # residual refs the placeholder pre-pass didn't match (1-char names)
        converted = self.entityref(name)
        if converted:
            self.push(converted, entity_char=True)

    def handle_charref(self, name: str) -> None:
        converted = self.charref(name)
        if converted:
            self.push(converted, entity_char=True)

    # comments / PIs / doctype dropped (boilerplate strip rule #1)
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass

    # ------------------------------------------------------------------
    # entity decoding (reference TextProcessor:82-152)
    # ------------------------------------------------------------------

    def charref(self, name: str) -> str:
        if not name:
            return ""
        if name[0] in ("x", "X"):
            try:
                c = int(name[1:], 16)
            except ValueError:
                c = 0
        else:
            try:
                c = int(name)
            except ValueError:
                c = 0
        if c <= 0 or c >= 0x110000 or (0xD800 <= c < 0xE000):
            c = 0xFFFD  # REPLACEMENT CHARACTER
        c = constants.CONTROL_CHARACTER_REPLACEMENTS.get(c, c)
        if not self.cfg.unicode_snob and c in constants.UNIFIABLE_N:
            return constants.UNIFIABLE_N[c]
        return chr(c)

    def entityref(self, c: str) -> str:
        if not self.cfg.unicode_snob and c in constants.UNIFIABLE:
            return constants.UNIFIABLE[c]
        if c == "nbsp":
            return constants.UNIFIABLE["nbsp"]
        decoded = html.entities.html5.get(c + ";")
        if decoded is None:
            return "&" + c + ";"
        return decoded

    def _convert_placeholder(self, kind: str, value: str) -> str:
        if kind == "CHAR":
            return self.charref(value)
        if kind == "RAW":  # literal __PH2T__ present in the source text
            return "__PH2T__"
        return self.entityref(value)

    @staticmethod
    def _normalize_plain_text(text: str) -> str:
        if not text:
            return text
        text = text.replace("\u200e", "").replace("\u200f", "")
        return text.replace("\u00a0", constants.NBSP_PLACEHOLDER)

    # ------------------------------------------------------------------
    # output state machine (reference DataContainer:74-305)
    # ------------------------------------------------------------------

    def out(self, s: str) -> None:
        self.outtextlist.append(s)
        if s:
            self.last_was_nl = s[-1] == "\n"

    def push(self, data: str, entity_char: bool = False) -> None:
        if not data:
            # data may be empty for some entities (e.g. LEFT-TO-RIGHT MARK)
            return

        if self.stressed:
            data = data.strip()
            self.stressed = False
            self.preceding_stressed = True
        elif self.preceding_stressed:
            if (
                _STRESSED_BOUNDARY_RE.match(data[0])
                and utils.hn(self.current_tag) == 0
                and self.current_tag not in ("a", "code", "pre")
            ):
                # should match a letter or common punctuation
                data = " " + data
            self.preceding_stressed = False

        if self.style:
            self.style_def.update(utils.dumb_css_parser(data))

        if self.maybe_automatic_link is not None:
            href = self.maybe_automatic_link
            if (
                href == data
                and constants.RE_ABSOLUTE_URL_MATCHER.match(href)
                and self.cfg.use_automatic_links
            ):
                self.o("<" + data + ">")
                self.empty_link = False
                return
            self.o("[")
            self.maybe_automatic_link = None
            self.empty_link = False

        if not self.code and not self.pre and not entity_char:
            data = utils.escape_md_section(data, snob=self.cfg.escape_snob)
        self.preceding_data = data
        self.empty_link = False
        self.o(data, puredata=True)

    def o(self, data: str, puredata: bool = False, force=False) -> None:
        """Emit output, handling indentation, whitespace and footnotes."""
        if self.abbr_data is not None:
            self.abbr_data += data

        if self.quiet:
            return

        if self.cfg.google_doc:
            # prevent whitespace immediately after 'begin emphasis' marks
            lstripped_data = data.lstrip()
            if self.drop_white_space and not (self.pre or self.code):
                data = lstripped_data
            if lstripped_data:
                self.drop_white_space = 0

        if puredata and not self.pre:
            if _WS_GUARD_RE.search(data):
                data = _WS_RE.sub(" ", data)
            if data and data[0] == " ":
                self.space = True
                data = data[1:]
        if not data and force is False:
            return

        if self.startpre:
            if not data.startswith("\n") and not data.startswith("\r\n"):
                data = "\n" + data
            if self.cfg.mark_code:
                self.out("\n[code]")
                self.p_p = 0

        bq = ">" * self.blockquote
        if not (force in (True, "end") and data and data[0] == ">") and self.blockquote:
            if bq:
                bq += " "

        if self.pre:
            if self.lst or self.list_code_indent:
                bq += self.list_code_indent
            if not self.cfg.backquote_code_style:
                bq += "    "
            data = data.replace("\n", "\n" + bq)
            self.pre_indent = bq

        if self.startpre:
            self.startpre = False
            if self.cfg.backquote_code_style:
                self.out("\n" + self.pre_indent + "```")
                self.p_p = 0
            elif self.list_code_indent or self.lst:
                # drop the first newline+indent so list-wrapped <pre> blocks
                # don't open with a blank line
                data = re.sub(
                    r"^\r?\n" + re.escape(self.pre_indent), "", data, count=1
                )

        if self.start:
            self.space = False
            self.p_p = 0
            self.start = False

        if force == "end":
            # It's the end.
            self.p_p = 0
            self.out("\n")
            self.space = False

        if self.p_p:
            self.out((self.br_toggle + "\n" + bq) * self.p_p)
            self.space = False
            self.br_toggle = ""

        if self.space:
            if not self.last_was_nl:
                self.out(" ")
            self.space = False

        if self.a and (
            (self.p_p == 2 and self.cfg.links_each_paragraph) or force == "end"
        ):
            if force == "end":
                self.out("\n")
            newa = []
            for link in self.a:
                if self.outcount > link.outcount:
                    self.out(
                        "   ["
                        + str(link.count)
                        + "]: "
                        + url_join(self.cfg.base_url, link.attrs.get("href") or "")
                    )
                    title = link.attrs.get("title")
                    if title is not None and str(title).strip():
                        self.out(" (" + title + ")")
                    self.out("\n")
                else:
                    newa.append(link)
            if len(self.a) != len(newa):
                # don't need an extra line when nothing was done
                self.out("\n")
            self.a = newa

        if self.abbr_list and force == "end":
            for abbr, definition in self.abbr_list.items():
                self.out("  *[" + abbr + "]: " + definition + "\n")

        self.p_p = 0
        self.out(data)
        self.outcount += 1

    def p(self) -> None:
        """Set pretty print to 1 or 2 lines."""
        self.p_p = 1 if self.cfg.single_line_break else 2

    def pbr(self) -> None:
        """Pretty print has a line break."""
        if self.p_p == 0:
            self.p_p = 1

    def soft_br(self) -> None:
        """Soft breaks."""
        self.pbr()
        self.br_toggle = "  "

    # ------------------------------------------------------------------
    # google-docs emphasis (reference DataContainer:311-399)
    # ------------------------------------------------------------------

    def add_emphasis(self, start: bool, tag_style: dict, parent_style: dict) -> None:
        tag_emphasis = utils.google_text_emphasis(tag_style)
        parent_emphasis = utils.google_text_emphasis(parent_style)

        # crossed-out text must be handled before other attributes in order
        # not to output qualifiers unnecessarily
        strikethrough = "line-through" in tag_emphasis and self.cfg.hide_strikethrough
        bold = False
        for bold_marker in self.cfg.bold_text_style_values:
            bold = bold_marker in tag_emphasis and bold_marker not in parent_emphasis
            if bold:
                break
        italic = "italic" in tag_emphasis and "italic" not in parent_emphasis
        fixed = (
            utils.google_fixed_width_font(tag_style)
            and not utils.google_fixed_width_font(parent_style)
            and not self.pre
        )

        if start:
            if bold or italic or fixed:
                self.emphasis += 1
            if strikethrough:
                self.quiet += 1
            if italic:
                self.o(self.cfg.emphasis_mark)
                self.drop_white_space += 1
            if bold:
                self.o(self.cfg.strong_mark)
                self.drop_white_space += 1
            if fixed:
                self.o("`")
                self.drop_white_space += 1
                self.code = True
        else:
            if bold or italic or fixed:
                # there must not be whitespace before closing emphasis mark
                self.emphasis -= 1
                self.space = False
            if fixed:
                if self.drop_white_space:
                    self.drop_white_space -= 1  # empty emphasis, drop it
                else:
                    self.o("`")
                self.code = False
            if bold:
                if self.drop_white_space:
                    self.drop_white_space -= 1  # empty emphasis, drop it
                else:
                    self.o(self.cfg.strong_mark)
            if italic:
                if self.drop_white_space:
                    self.drop_white_space -= 1  # empty emphasis, drop it
                else:
                    self.o(self.cfg.emphasis_mark)
            # space is only allowed after *all* emphasis marks
            if (bold or italic) and not self.emphasis:
                self.o(" ")
            if strikethrough:
                self.quiet -= 1

    # ------------------------------------------------------------------
    # tag dispatch (reference TagProcessor:60-545)
    # ------------------------------------------------------------------

    def handle_tag(self, tag: str, attrs: Dict[str, Optional[str]], start: bool):
        self.current_tag = tag
        # shared empty dict, not two fresh allocations per tag event:
        # both fields are only READ (google_text_emphasis & co), and the
        # google_doc block below rebinds them to real dicts
        self.parent_style = _EMPTY_STYLE
        self.tag_style = _EMPTY_STYLE

        if self.cfg.tag_callback is not None:
            if self.cfg.tag_callback(self, tag, attrs, start) is True:
                return

        # first thing inside the anchor tag is another tag that produces
        # some output
        if (
            start
            and self.maybe_automatic_link is not None
            and tag not in ("p", "div", "style", "dl", "dt")
            and (tag != "img" or self.cfg.ignore_images)
        ):
            self.o("[")
            self.maybe_automatic_link = None
            self.empty_link = False

        if self.cfg.google_doc:
            # the attrs dict is empty for a closing tag, and we need the
            # parent styles to resolve the effective style of this element
            if start:
                if self.tag_stack:
                    self.parent_style = self.tag_stack[-1][2]
                self.tag_style = utils.element_style(
                    attrs, self.style_def, self.parent_style
                )
                self.tag_stack.append((tag, attrs, self.tag_style))
            else:
                if self.tag_stack:
                    _, attrs, self.tag_style = self.tag_stack.pop()
                else:
                    attrs = {}
                    self.tag_style = {}
                if self.tag_stack:
                    self.parent_style = self.tag_stack[-1][2]

        if tag not in _HANDLED_TAGS and not self.cfg.google_doc:
            # unknown/pass-through tag (span, font, section, ...): none of
            # the dispatch blocks below fire; only the ol/ul else-branch
            # side effect remains.  (googleDoc mode must fall through:
            # add_emphasis inspects the CSS of every element.)
            self.last_was_list = False
            return

        # Dispatch: the original reference runs ~20 sequential tag tests
        # per event; the sets are mutually exclusive (verified below), so
        # an ordered elif chain is behavior-identical and ~halves the
        # average compare count on the hottest converter function.  Two
        # invariants are load-bearing and preserved exactly:
        #   * googleDoc's add_emphasis runs between the del/strike block
        #     and the kbd block FOR EVERY TAG -> the chain is split into
        #     an early and a late group around it;
        #   * the reference's ol/ul else-branch resets last_was_list for
        #     every non-ol/ul tag UNLESS an earlier block returned -> the
        #     reset moved to the end (nothing between reads it), and all
        #     early returns still skip it.
        header_level = utils.hn(tag)
        matched_early = True
        if header_level > 0:
            # header inside an 'a' tag (incorrect but found in the wild)
            if self.astack:
                if start:
                    self.inheader = True
                    # only add '#' if it can appear before '['
                    if self.outtextlist and self.outtextlist[-1] == "[":
                        self.outtextlist.pop()
                        self.space = False
                        self.o("#" * header_level + " ")
                        self.o("[")
                else:
                    self.p_p = 0  # don't break up link name
                    self.inheader = False
                    return  # prevent redundant emphasis marks on headers
            else:
                self.p()
                if start:
                    self.inheader = True
                    self.o("#" * header_level + " ")
                else:
                    self.inheader = False
                    self.p()
                    return  # prevent redundant emphasis marks on headers

        elif tag in ("p", "div"):
            if self.cfg.google_doc:
                if start and utils.google_has_height(self.tag_style):
                    self.p()
                else:
                    self.soft_br()
            elif self.astack or self.split_next_td:
                pass
            else:
                self.p()

        elif tag == "br":
            if start:
                # avoid carrying over pending spaces before explicit breaks
                self.space = False
                if self.blockquote > 0:
                    self.o("  \n> ")
                else:
                    self.o("  \n")

        elif tag == "hr":
            if start:
                self.p()
                self.o("* * *")
                self.p()

        elif tag in ("head", "style", "script", "body"):
            if tag == "body":
                self.quiet = 0  # sites like 9rules.com never close <head>
            else:
                if start:
                    self.quiet += 1
                else:
                    self.quiet -= 1
                if tag == "style":
                    if start:
                        self.style += 1
                    else:
                        self.style -= 1

        elif tag == "blockquote":
            if start:
                self.p()
                self.o("> ", puredata=False, force=True)
                self.start = True
                self.blockquote += 1
            else:
                self.blockquote -= 1
                self.p()

        elif tag in ("em", "i", "u"):
            if not self.cfg.ignore_emphasis:
                # Separate with a space if we immediately follow an
                # alphanumeric character, since otherwise Markdown won't
                # render the emphasis marks ('foo_bar_' stays visible).
                if (
                    start
                    and self.preceding_data
                    and not self.preceding_data[-1].isspace()
                    and not _is_punctuation(self.preceding_data[-1])
                ):
                    emphasis = " " + self.cfg.emphasis_mark
                    self.preceding_data += " "
                else:
                    emphasis = self.cfg.emphasis_mark
                self.o(emphasis)
                if start:
                    self.stressed = True

        elif tag in ("strong", "b"):
            if not self.cfg.ignore_emphasis:
                # Separate with space if we immediately follow an *
                # character, else Markdown won't render the resulting ***.
                if (
                    start
                    and self.preceding_data
                    # empty strong_mark: the lookup would IndexError
                    and self.cfg.strong_mark
                    and self.preceding_data[-1] == self.cfg.strong_mark[0]
                ):
                    strong = " " + self.cfg.strong_mark
                    self.preceding_data += " "
                else:
                    strong = self.cfg.strong_mark
                self.o(strong)
                if start:
                    self.stressed = True

        elif tag in ("del", "strike", "s"):
            if start and self.preceding_data and self.preceding_data.endswith("~"):
                strike = " ~~"
                self.preceding_data += " "
            else:
                strike = "~~"
            self.o(strike)
            if start:
                self.stressed = True

        else:
            matched_early = False

        if self.cfg.google_doc:
            if not self.inheader:
                # handle some font attributes, but leave headers clean
                self.add_emphasis(start, self.tag_style, self.parent_style)

        if matched_early:
            pass

        elif tag in ("kbd", "code", "tt"):
            if not self.pre:
                self.o("`")  # TODO: `` `this` ``
                self.code = not self.code

        elif tag == "abbr":
            if start:
                self.abbr_title = None
                self.abbr_data = ""
                if attrs.get("title") is not None:
                    self.abbr_title = attrs["title"]
            else:
                if self.abbr_title is not None and self.abbr_data is not None:
                    self.abbr_list[self.abbr_data] = self.abbr_title
                    self.abbr_title = None
                self.abbr_data = None

        elif tag == "q":
            if not self.quote:
                self.o(self.cfg.open_quote)
            else:
                self.o(self.cfg.close_quote)
            self.quote = not self.quote

        elif tag == "a" and not self.cfg.ignore_anchors:
            if start:
                href = attrs.get("href")
                if (
                    href is not None
                    and not (self.cfg.skip_internal_links and href.startswith("#"))
                    and not (
                        self.cfg.ignore_mailto_links and href.startswith("mailto:")
                    )
                ):
                    if self.cfg.protect_links:
                        attrs = dict(attrs)
                        attrs["href"] = "<" + href + ">"
                    self.astack.append(attrs)
                    self.maybe_automatic_link = attrs["href"]
                    self.empty_link = True
                else:
                    self.astack.append(None)
            else:
                if self.astack:
                    a = self.astack.pop()
                    if self.maybe_automatic_link is not None and not self.empty_link:
                        self.maybe_automatic_link = None
                    else:
                        if a is not None and self.empty_link:
                            self.o("[")
                            self.empty_link = False
                            self.maybe_automatic_link = None
                        if a is not None:
                            self._finalize_anchor(a)

        elif tag == "img" and start:
            src = attrs.get("src")
            if src:
                self.media_refs.append(MediaRef(src, self.segment))
            if not self.cfg.ignore_images and src:
                if not self.cfg.images_to_alt:
                    attrs = dict(attrs)
                    attrs["href"] = src
                alt = attrs.get("alt")
                if alt is None:
                    alt = self.cfg.default_image_alt

                # with images_with_size, write raw html including width,
                # height, and alt attributes
                if self.cfg.images_as_html or (
                    self.cfg.images_with_size
                    and ("width" in attrs or "height" in attrs)
                ):
                    self.o("<img src='" + src + "' ")
                    if attrs.get("width"):
                        self.o("width='" + str(attrs["width"]) + "' ")
                    if attrs.get("height"):
                        self.o("height='" + str(attrs["height"]) + "' ")
                    if alt:
                        self.o("alt='" + alt + "' ")
                    self.o("/>")
                    return

                # if we have a link to create, output the start
                if self.maybe_automatic_link is not None:
                    href = self.maybe_automatic_link
                    if (
                        self.cfg.images_to_alt
                        and utils.escape_md(alt) == href
                        and constants.RE_ABSOLUTE_URL_MATCHER.match(href)
                    ):
                        self.o("<" + utils.escape_md(alt) + ">")
                        self.empty_link = False
                        return
                    self.o("[")
                    self.maybe_automatic_link = None
                    self.empty_link = False

                # with images_to_alt we discard the image itself and keep
                # only the alt text
                if self.cfg.images_to_alt:
                    self.o(utils.escape_md(alt))
                else:
                    self.o("![" + utils.escape_md(alt) + "]")
                    if self.cfg.inline_links:
                        href = attrs.get("href") or ""
                        self.o(
                            "("
                            + utils.escape_md(url_join(self.cfg.base_url, href))
                            + ")"
                        )
                    else:
                        a_props = self._footnote_props(attrs)
                        self.o("[" + str(a_props.count) + "]")

        elif tag == "dl":
            if start:
                self.p()
        elif tag == "dt":
            if not start:
                self.pbr()
        elif tag == "dd":
            if start:
                self.o("    ")
            else:
                self.pbr()

        elif tag in ("ol", "ul"):
            # Google Docs create sub lists as top level lists
            if not self.lst and not self.last_was_list:
                self.p()
            if start:
                if self.cfg.google_doc:
                    list_style = utils.google_list_style(self.tag_style)
                else:
                    list_style = tag
                numbering_start = utils.list_numbering_start(attrs)
                self.lst.append(ListElement(list_style, numbering_start))
            else:
                if self.lst:
                    self.lst.pop()
                    if not self.cfg.google_doc and not self.lst:
                        self.o("\n")
            self.last_was_list = True
            return  # reference's else-branch reset must not fire for ol/ul

        elif tag == "li":
            self.list_code_indent = ""
            self.pbr()
            if start:
                if self.lst:
                    li = self.lst[-1]
                else:
                    li = ListElement("ul", 0)
                if self.cfg.google_doc:
                    self.o(
                        "  "
                        * utils.google_nest_count(
                            self.tag_style, self.cfg.google_list_indent
                        )
                    )
                else:
                    # indent two spaces per enclosing list, except three for
                    # lists nested under an ordered list (whose "N. " marker
                    # is three chars wide)
                    parent_list = None
                    for list_element in self.lst:
                        self.list_code_indent += (
                            "   " if parent_list == "ol" else "  "
                        )
                        parent_list = list_element.name
                    self.o(self.list_code_indent)

                if li.name == "ul":
                    self.list_code_indent += "  "
                    self.o(self.cfg.ul_item_mark + " ")
                elif li.name == "ol":
                    li.num += 1
                    self.list_code_indent += "   "
                    self.o(str(li.num) + ". ")
                self.start = True

        elif tag in ("table", "tr", "td", "th"):
            if self.cfg.ignore_tables:
                if tag == "tr" and not start:
                    self.soft_br()
            elif self.cfg.bypass_tables:
                if start:
                    self.soft_br()
                if tag in ("td", "th"):
                    if start:
                        self.o("<{}>\n\n".format(tag))
                    else:
                        self.o("\n</{}>".format(tag))
                else:
                    if start:
                        self.o("<{}>".format(tag))
                    else:
                        self.o("</{}>".format(tag))
            else:
                if tag == "table":
                    if start:
                        self.table_start = True
                        if self.cfg.pad_tables:
                            self.o("<" + constants.TABLE_MARKER_FOR_PAD + ">")
                            self.o("  \n")
                    else:
                        if self.cfg.pad_tables:
                            # break in case the table is empty or a 1-row table
                            self.soft_br()
                            self.o("</" + constants.TABLE_MARKER_FOR_PAD + ">")
                            self.o("  \n")
                if tag in ("td", "th") and start:
                    if self.split_next_td:
                        self.o("| ")
                    self.split_next_td = True
                if tag == "tr" and start:
                    self.td_count = 0
                if tag == "tr" and not start:
                    self.split_next_td = False
                    self.soft_br()
                if tag == "tr" and not start and self.table_start:
                    # underline table header
                    if self.td_count > 0:
                        self.o("|".join(["---"] * self.td_count))
                    self.soft_br()
                    self.table_start = False
                if tag in ("td", "th") and start:
                    self.td_count += 1

        elif tag == "pre":
            if start:
                self.startpre = True
                self.pre = True
                self.pre_indent = ""
            else:
                self.pre = False
                if self.cfg.backquote_code_style:
                    self.out("\n" + self.pre_indent + "```")
                if self.cfg.mark_code:
                    self.out("\n[/code]")
            self.p()

        elif tag in ("sup", "sub") and self.cfg.include_sup_sub:
            if start:
                self.o("<{}>".format(tag))
            else:
                self.o("</{}>".format(tag))

        # the reference's ol/ul else-branch: every tag event that reaches
        # this point (no early return, not ol/ul) resets the flag
        self.last_was_list = False

    # ------------------------------------------------------------------
    # anchors (reference TagProcessor:572-716)
    # ------------------------------------------------------------------

    def _finalize_anchor(self, attrs: Dict[str, Optional[str]]) -> None:
        if self.cfg.inline_links:
            self.p_p = 0
            title = utils.escape_md(attrs.get("title") or "")
            href = attrs.get("href") or ""
            url = url_join(self.cfg.base_url, href)
            title_part = ' "' + title + '"' if title.strip() else ""
            self.o("](" + utils.escape_md(url) + title_part + ")")
            return
        a_props = self._footnote_props(attrs)
        self.o("][" + str(a_props.count) + "]")

    def _footnote_props(self, attrs: Dict[str, Optional[str]]) -> AnchorElement:
        """Look up (or register) the footnote entry for these attrs."""
        i = self._previous_index(attrs)
        if i is not None:
            return self.a[i]
        self.acount += 1
        a_props = AnchorElement(attrs, self.acount, self.outcount)
        self.a.append(a_props)
        return a_props

    def _previous_index(self, attrs: Dict[str, Optional[str]]) -> Optional[int]:
        """Index of a matching (href, title) pair in the footnote list."""
        if attrs.get("href") is None:
            return None
        for i, a in enumerate(self.a):
            if "href" in a.attrs and a.attrs["href"] == attrs["href"]:
                if "title" in a.attrs or "title" in attrs:
                    if (
                        "title" in a.attrs
                        and "title" in attrs
                        and a.attrs["title"] == attrs["title"]
                    ):
                        return i
                else:
                    return i
        return None

    # ------------------------------------------------------------------
    # document finalization (reference HTML2Markdown:59-73)
    # ------------------------------------------------------------------

    def finish(self) -> str:
        self.pbr()
        self.o("", force="end")
        outtext = "".join(self.outtextlist)
        nbsp = "\u00a0" if self.cfg.unicode_snob else " "
        return outtext.replace(constants.NBSP_PLACEHOLDER, nbsp)


def _is_punctuation(ch: str) -> bool:
    """Unicode general-category P test (the reference's \\p{P})."""
    import unicodedata

    return unicodedata.category(ch).startswith("P")


# ----------------------------------------------------------------------
# wrap pass (reference WrapProcessor:22-127)
# ----------------------------------------------------------------------


def _fast_wrap(para: str, width: int, indent: str) -> List[str]:
    """Greedy wrap, byte-identical to textwrap.wrap(break_long_words=False,
    subsequent_indent=indent) for the eligible subset: single-space word
    separators, no hyphens (textwrap's wordsep/em-dash machinery never
    fires), no edge/control whitespace.  Caller checks eligibility.

    (A prefix-sum + bisect variant was measured SLOWER at realistic
    paragraph sizes -- building the cumulative array costs more than the
    simple loop saves; keep the direct greedy loop.)
    """
    words = para.split(" ")
    lines: List[str] = []
    cur: List[str] = []
    cur_len = 0
    avail = width
    for word in words:
        add = len(word) + 1 if cur else len(word)
        if not cur or cur_len + add <= avail:
            cur.append(word)
            cur_len += add
        else:
            lines.append(" ".join(cur))
            avail = width - len(indent)
            cur = [word]
            cur_len = len(word)
    if cur:
        lines.append(" ".join(cur))
    if indent:
        lines = lines[:1] + [indent + line for line in lines[1:]]
    return lines


def _wrap_para(para: str, width: int, indent: str) -> List[str]:
    if (
        "-" not in para
        and "  " not in para
        and para == para.strip()
        and "\t" not in para
        and "\x0b" not in para
        and "\x0c" not in para
        and "\r" not in para
    ):
        return _fast_wrap(para, width, indent)
    return textwrap.wrap(
        para, width, break_long_words=False, subsequent_indent=indent
    )


@dataclass
class WrapState:
    """optwrap carry-over so interleaved segments wrap like one document."""

    newlines: int = 0
    start_code: bool = False


def optwrap(text: str, cfg: Config, state: Optional[WrapState] = None) -> str:
    """Wrap all paragraphs of converted output at cfg.body_width."""
    if not cfg.body_width:
        return text
    if state is None:
        state = WrapState()

    result = []
    wrap_links = cfg.wrap_links
    for para in text.split("\n"):
        # text between tri-backquote pairs is a code block; don't wrap
        if cfg.backquote_code_style and para.lstrip().startswith("```"):
            state.start_code = not state.start_code
        if state.start_code:
            result.append(para + "\n")
            state.newlines = 1
        elif para:
            if not utils.skipwrap(
                para, wrap_links, cfg.wrap_list_items, cfg.wrap_tables
            ):
                indent = ""
                if para.startswith("  " + cfg.ul_item_mark):
                    # list item continuation: double indent on new lines
                    indent = "    "
                elif para.startswith("> "):
                    # blockquote continuation: prefix '>' on new lines
                    indent = "> "
                if (
                    len(para) <= cfg.body_width
                    and para == para.strip()
                    and "\t" not in para
                    and "\x0b" not in para
                    and "\x0c" not in para
                    and "\r" not in para
                ):
                    # fits on one line and textwrap would return it
                    # verbatim (no edge whitespace to drop, no tabs to
                    # expand) -- skip the chunk-splitting machinery
                    result.append(para)
                else:
                    wrapped = _wrap_para(para, cfg.body_width, indent)
                    result.append("\n".join(wrapped))
                if para.endswith("  "):
                    result.append("  \n")
                    state.newlines = 1
                elif indent:
                    result.append("\n")
                    state.newlines = 1
                else:
                    result.append("\n\n")
                    state.newlines = 2
            else:
                # warning for the tempted: this is NOT line.isspace().
                # Anchored match (upstream-Python semantics): the PHP port
                # searches /\s\+/ anywhere, which silently DROPS list items
                # when ul_item_mark='+' ("  + a" contains " +"); no fixture
                # distinguishes, so we keep the content-preserving form.
                if not constants.RE_SPACE.match(para):
                    result.append(para + "\n")
                    state.newlines = 1
        else:
            if state.newlines < 2:
                result.append("\n")
                state.newlines += 1
    return "".join(result)


# ----------------------------------------------------------------------
# public per-document API
# ----------------------------------------------------------------------


#: test hook: force the HTMLParser path (differential fuzzing)
_FORCE_FALLBACK = False


def _dispatch_events(parser: "_Parser", events: list) -> None:
    """Replay fast-tokenizer events into the parser's handlers."""
    handle_data = parser.handle_data
    handle_tag = parser.handle_tag
    attr_dict = parser._attr_dict
    for ev in events:
        kind = ev[0]
        if kind == "data":
            handle_data(ev[1])
        elif kind == "start":
            handle_tag(ev[1], attr_dict(ev[2]), start=True)
        else:
            handle_tag(ev[1], {}, start=False)


def _feed_document(parser: "_Parser", processed: str) -> None:
    """Feed one complete pre-processed document: fast regex tokenizer when
    eligible, html.parser.HTMLParser otherwise (identical event streams --
    see _fast_tokenize)."""
    events = None if _FORCE_FALLBACK else _fast_tokenize(processed)
    if events is None:
        parser.feed(processed)
        return
    _dispatch_events(parser, events)


def convert(html_text: str, cfg: Optional[Config] = None) -> str:
    """Convert one HTML document to markdown-formatted plain text."""
    cfg = cfg or Config()
    html_text = html_text.strip()
    if not html_text:
        return ""
    parser = _Parser(cfg)
    _feed_document(parser, _preprocess_entities(html_text))
    parser.close()
    result = optwrap(parser.finish(), cfg)
    if cfg.pad_tables:
        return utils.pad_tables_in_text(result)
    return result


def convert_spans(
    spans: List[Tuple[str, str, str]], cfg: Optional[Config] = None
) -> List[Tuple[str, str, str]]:
    """Convert one interleaved document (the graft's span pipeline).

    ``spans`` is the input span list in offset order as (kind, text,
    media_ref) with kind in {'html', 'media'}.  Returns output spans
    (kind, text, media_ref) with kind in {'text', 'media_ref'} such that

      * for a pure-html document, concatenating the 'text' spans in order
        reproduces ``convert()`` of the concatenated html (invariant 1);
      * 'media_ref' spans appear once per input media span and once per
        <img> element, in document order (invariant 2).

    html fragments are fed incrementally to one tokenizer so conversion
    state (lists, blockquotes, footnotes) crosses fragments exactly as if
    the document were contiguous.  A passthrough media span acts as a
    block boundary: the pending paragraph break is flushed so each text
    segment ends on a line boundary, and the wrap pass runs per segment
    with carried state (equivalent to wrapping the whole document because
    ``optwrap`` is line-at-a-time with only the blank-line counter as
    cross-line state).
    """
    cfg = cfg or Config()
    html_all = "".join(t for k, t, _ in spans if k == "html").strip()
    if not html_all:
        return [
            ("media_ref", "", media)
            for kind, _text, media in spans
            if kind == "media"
        ]

    parser = _Parser(cfg)
    raw_boundaries: List[int] = []  # outtextlist index at each segment end
    # media events in document order: ("img", ref, segment) from the tag
    # dispatcher plus ("pass", ref, segment) recorded here at boundaries
    ordered_media: List[Tuple[str, int]] = []

    def _drain_img_refs() -> None:
        while parser.media_refs:
            ref = parser.media_refs.pop(0)
            ordered_media.append((ref.media_ref, ref.segment))

    # coalesce runs of consecutive html spans: a fragment boundary is only
    # meaningful where a media span sits between them (feeding fragments
    # separately would let tokenizer-buffer chunking interact with the
    # stressed/whitespace state machine and break invariant 1)
    coalesced: List[Tuple[str, str, str]] = []
    for kind, text, media in spans:
        if kind == "html" and coalesced and coalesced[-1][0] == "html":
            coalesced[-1] = ("html", coalesced[-1][1] + text, "")
        else:
            coalesced.append((kind, text, media))
    spans = coalesced
    multi_fragment = sum(1 for k, _t, _m in spans if k == "html") > 1
    # fast path for interleaved documents: if EVERY html fragment
    # fast-tokenizes on its own, no fragment ends mid-token (the fast
    # tokenizer rejects dangling '<'/unterminated constructs), so direct
    # event dispatch is event-identical to HTMLParser's incremental
    # feed -- which is only needed when a tag genuinely straddles a
    # media boundary, and that case falls back whole-document below.
    # Differentially fuzzed in tests/test_fast_tokenizer.py.
    frag_events: Dict[int, Optional[list]] = {}
    if multi_fragment and not _FORCE_FALLBACK:
        for i, (kind, text, _media) in enumerate(spans):
            if kind != "html":
                continue
            events = _fast_tokenize(_preprocess_entities(text))
            if events is None:
                frag_events.clear()
                break
            frag_events[i] = events
    for i, (kind, text, media) in enumerate(spans):
        if kind == "html":
            if multi_fragment:
                if frag_events:
                    _dispatch_events(parser, frag_events[i])
                else:
                    # a fragment may split mid-tag across a media
                    # boundary; HTMLParser's incremental buffer handles
                    # that, the fast tokenizer does not
                    parser.feed(_preprocess_entities(text))
            else:
                _feed_document(parser, _preprocess_entities(text))
        elif kind == "media":
            # flush the pending paragraph break so the segment ends on a
            # clean line boundary before the media asset
            parser.pbr()
            parser.o("", puredata=False, force=True)
            _drain_img_refs()
            raw_boundaries.append(len(parser.outtextlist))
            ordered_media.append((media, parser.segment))
            parser.segment += 1
    parser.close()
    parser.finish()  # appends the final chunks to outtextlist
    _drain_img_refs()

    chunks = parser.outtextlist
    nbsp = "\u00a0" if cfg.unicode_snob else " "

    def _join(lo: int, hi: int) -> str:
        return "".join(chunks[lo:hi]).replace(constants.NBSP_PLACEHOLDER, nbsp)

    segment_texts: List[str] = []
    prev = 0
    for b in raw_boundaries:
        segment_texts.append(_join(prev, b))
        prev = b
    segment_texts.append(_join(prev, len(chunks)))

    # wrap per segment with carried state; segments end on line boundaries
    if cfg.body_width:
        state = WrapState()
        segment_texts = [optwrap(seg, cfg, state) for seg in segment_texts]
    if cfg.pad_tables:
        # thread the sentinel-block state across segments (a media span
        # inside a padded table must not drop the buffered rows)
        pad_state = utils.PadTableState()
        last = len(segment_texts) - 1
        segment_texts = [
            utils.pad_tables_in_text(s, state=pad_state, flush=(i == last))
            for i, s in enumerate(segment_texts)
        ]

    media_by_segment: Dict[int, List[str]] = {}
    for media, seg_idx in ordered_media:
        media_by_segment.setdefault(seg_idx, []).append(media)

    out_spans: List[Tuple[str, str, str]] = []
    for i, seg_text in enumerate(segment_texts):
        if seg_text:
            out_spans.append(("text", seg_text, ""))
        for media in media_by_segment.get(i, []):
            out_spans.append(("media_ref", "", media))
    return out_spans
