"""Conversion options for the HTML -> markdown span extractor.

Mirrors the 36-field option surface of the reference configuration object
(/root/reference/src/Config.php:9-86) so every reference fixture can be
reproduced.  The dataclass is frozen so a single instance can be captured by
a Spark UDF closure / broadcast safely.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Callable, Optional, Tuple


@dataclass(frozen=True)
class Config:
    # unicode / escaping
    unicode_snob: bool = False
    escape_snob: bool = False
    # links
    links_each_paragraph: bool = False
    body_width: int = 78
    skip_internal_links: bool = True
    inline_links: bool = True
    protect_links: bool = False
    wrap_links: bool = True
    wrap_list_items: bool = False
    wrap_tables: bool = False
    # google docs mode
    google_doc: bool = False
    google_list_indent: int = 36
    bold_text_style_values: Tuple[str, ...] = ("bold", "700", "800", "900")
    hide_strikethrough: bool = False
    # ignore switches
    ignore_anchors: bool = False
    ignore_mailto_links: bool = False
    ignore_images: bool = False
    images_as_html: bool = False
    images_to_alt: bool = False
    images_with_size: bool = False
    ignore_emphasis: bool = False
    # code blocks
    mark_code: bool = False
    backquote_code_style: bool = False
    # images / tables
    default_image_alt: str = ""
    pad_tables: bool = False
    use_automatic_links: bool = True
    bypass_tables: bool = False
    ignore_tables: bool = False
    # layout
    single_line_break: bool = False
    open_quote: str = '"'
    close_quote: str = '"'
    include_sup_sub: bool = False
    base_url: str = ""
    ul_item_mark: str = "*"
    emphasis_mark: str = "_"
    strong_mark: str = "**"
    # extension point: callable(converter, tag, attrs, start) -> bool
    # (True swallows the tag event) -- reference Config::tagCallback
    tag_callback: Optional[Callable[..., bool]] = field(default=None, compare=False)

    def evolve(self, **kwargs: Any) -> "Config":
        return replace(self, **kwargs)


#: camelCase aliases used by the reference test harness / FIXTURES.md tables.
_ALIASES = {
    "unicodeSnob": "unicode_snob",
    "escapeSnob": "escape_snob",
    "linksEachParagraph": "links_each_paragraph",
    "bodyWidth": "body_width",
    "bodywidth": "body_width",
    "skipInternalLinks": "skip_internal_links",
    "inlineLinks": "inline_links",
    "protectLinks": "protect_links",
    "wrapLinks": "wrap_links",
    "wrapListItems": "wrap_list_items",
    "wrapTables": "wrap_tables",
    "googleDoc": "google_doc",
    "googleListIndent": "google_list_indent",
    "boldTextStyleValues": "bold_text_style_values",
    "hideStrikethrough": "hide_strikethrough",
    "ignoreAnchors": "ignore_anchors",
    "ignoreMailtoLinks": "ignore_mailto_links",
    "ignoreImages": "ignore_images",
    "imagesAsHtml": "images_as_html",
    "imagesToAlt": "images_to_alt",
    "imagesWithSize": "images_with_size",
    "ignoreEmphasis": "ignore_emphasis",
    "markCode": "mark_code",
    "backquoteCodeStyle": "backquote_code_style",
    "defaultImageAlt": "default_image_alt",
    "padTables": "pad_tables",
    "useAutomaticLinks": "use_automatic_links",
    "bypassTables": "bypass_tables",
    "ignoreTables": "ignore_tables",
    "singleLineBreak": "single_line_break",
    "openQuote": "open_quote",
    "closeQuote": "close_quote",
    "includeSupSub": "include_sup_sub",
    "baseUrl": "base_url",
    "baseurl": "base_url",
    "ulItemMark": "ul_item_mark",
    "emphasisMark": "emphasis_mark",
    "strongMark": "strong_mark",
    "tagCallback": "tag_callback",
}


def config_from_options(options: dict) -> Config:
    """Build a Config from camelCase or snake_case option dicts."""
    normalized = {}
    for key, value in options.items():
        key = _ALIASES.get(key, key)
        if isinstance(value, list):
            value = tuple(value)
        normalized[key] = value
    return Config(**normalized)
