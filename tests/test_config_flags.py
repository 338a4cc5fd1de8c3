"""Behavioral coverage for Config options no golden fixture exercises
(the reference surface is 36 options; the fixture harness drives ~20)."""

from html2text_spark.core.config import Config
from html2text_spark.core.converter import convert


def test_ignore_emphasis():
    assert (
        convert("A <b>B</b> <i>C</i>.", Config(ignore_emphasis=True))
        == "A B C.\n\n"
    )


def test_ignore_anchors():
    assert (
        convert('see <a href="http://x/">the link</a> here',
                Config(ignore_anchors=True))
        == "see the link here\n\n"
    )


def test_ignore_images():
    # double space is faithful reference behavior: text nodes on both
    # sides of the removed inline element each contribute their space
    assert (
        convert('x <img src="s.png" alt="a"/> y', Config(ignore_images=True))
        == "x  y\n\n"
    )


def test_use_automatic_links_off():
    out = convert(
        '<a href="http://a/">http://a/</a>', Config(use_automatic_links=False)
    )
    assert out == "[http://a/](http://a/)\n\n"
    # and on (default): identical text+href collapses to <url>
    assert convert('<a href="http://a/">http://a/</a>') == "<http://a/>\n\n"


def test_custom_quote_marks():
    assert (
        convert("<q>word</q>", Config(open_quote="«", close_quote="»"))
        == "«word»\n\n"
    )


def test_links_each_paragraph():
    out = convert(
        '<p><a href="http://a/">one</a></p><p><a href="http://b/">two</a></p>',
        Config(inline_links=False, links_each_paragraph=True),
    )
    # footnote [1] must flush between the paragraphs, before "two"
    assert out.index("[1]: http://a/") < out.index("[two]")
    assert "[2]: http://b/" in out
    # without the flag both footnotes trail the document
    out2 = convert(
        '<p><a href="http://a/">one</a></p><p><a href="http://b/">two</a></p>',
        Config(inline_links=False),
    )
    assert out2.index("[two]") < out2.index("[1]: http://a/")


def test_custom_ul_item_mark():
    assert convert("<ul><li>a</li></ul>", Config(ul_item_mark="+")) == "  + a\n\n"


def test_google_list_indent_option():
    html = '<ul><li style="margin-left:72px">deep</li></ul>'
    narrow = convert(html, Config(google_doc=True, google_list_indent=36,
                                  body_width=0))
    wide = convert(html, Config(google_doc=True, google_list_indent=72,
                                body_width=0))
    # 72px = 2 levels at indent 36, 1 level at indent 72
    assert narrow.startswith("    ")
    assert not wide.startswith("    ")


def test_config_from_options_aliases():
    from html2text_spark.core.config import config_from_options

    cfg = config_from_options(
        {"bodyWidth": 0, "ulItemMark": "-", "baseurl": "http://x/",
         "bold_text_style_values": ["bold"], "googleDoc": True}
    )
    assert cfg.body_width == 0
    assert cfg.ul_item_mark == "-"
    assert cfg.base_url == "http://x/"
    assert cfg.bold_text_style_values == ("bold",)
    assert cfg.google_doc is True
