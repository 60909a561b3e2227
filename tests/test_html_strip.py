"""HTMLStripCharFilter subset vs the reference goldens
(``TestHTMLStripCharFilter.java``) — every case inside the documented
scope."""

from __future__ import annotations

from lucene_solr_spark.functions.html_strip import html_strip


def test_main_golden():
    html = (
        '<div class="foo">this is some text</div> here is a <a href="#bar">'
        'link</a> and another <a href="http://lucene.apache.org/">link</a>. '
        "This is an entity: &amp; plus a &lt;.  Here is an &. "
        "<!-- is a comment -->"
    )
    gold = (
        "\nthis is some text\n here is a link and another link. "
        "This is an entity: & plus a <.  Here is an &. "
    )
    assert html_strip(html) == gold


def test_gamma_and_entities():
    assert html_strip("&Gamma;", {"reserved"}) == "Γ"
    test = "&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;"
    gold = "  <foo> Übermensch = Γ bar Γ"
    assert html_strip(test, {"reserved"}) == gold
    test = "&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;"
    gold = "  <junk/>   ! @ and ’"
    assert html_strip(test, {"reserved"}) == gold


def test_reserved_tags_preserved():
    test = (
        'aaa bbb <reserved ccc="ddddd"> eeee </reserved> ffff '
        '<reserved ggg="hhhh"/> <other/>'
    )
    result = html_strip(test, {"reserved"})
    assert result.index("reserved") == 9
    assert result.index("reserved", 15) == 38
    assert result.index("reserved", 41) == 54
    assert "other" not in result


def test_comments():
    assert html_strip("<!--- three dashes, still a valid comment ---> ") == " "
    assert html_strip("<! -- blah > ") == " "  # not a comment: bang-tag
    assert html_strip("<!--" + "x" * 500) == ""  # unclosed → EOF


def test_server_side_includes():
    test = (
        'one<img src="image.png"\n'
        " alt =  \"Alt: <!--#echo var='${IMAGE_CAPTION:<!--comment-->"
        "\\'Comment\\'}'  -->\"\n\n"
        ' title="Title: <!--#echo var="IMAGE_CAPTION"-->">two'
    )
    assert html_strip(test) == "onetwo"
    test = (
        'one<script><!-- <!--#config comment="<!-- \\"comment\\"-->"'
        "--> --></script>two"
    )
    assert html_strip(test) == "one\ntwo"


def test_script_quotes():
    test = (
        "one<script attr= bare><!-- action('<!-- comment -->', "
        '"\\"-->\\""); --></script>two'
    )
    assert html_strip(test) == "one\ntwo"
    test = "hello<script><!-- f('<!--internal--></script>'); --></script>"
    assert html_strip(test) == "hello\n"


def test_escape_script_style():
    test = "one<script no-value-attr>callSomeMethod();</script>two"
    gold = "one<script no-value-attr></script>two"
    assert html_strip(test, {"SCRIPT"}) == gold
    test = (
        'one<style type="text/css"> body,font,a { font-family:arial; } '
        "</style>two"
    )
    gold = 'one<style type="text/css"></style>two'
    assert html_strip(test, {"STYLE"}) == gold


def test_style():
    test = (
        'one<style type="text/css">\n<!--\n'
        "@import url('http://www.lasletrasdecanciones.com/css.css');\n-->\n"
        "</style>two"
    )
    assert html_strip(test) == "one\ntwo"


def test_br():
    assert html_strip("one<BR />two<br>three") == "one\ntwo\nthree"
    assert html_strip("one<BR some stuff here too>two</BR>") == "one\ntwo\n"
    test = "one<BR class='whatever'>two</\nBR\n>"
    assert html_strip(test, {"BR"}) == test


def test_inline_tags_no_space():
    test = 'one<sPAn class="invisible">two<sup>2<sup>e</sup></sup>.</SpaN>three'
    assert html_strip(test) == "onetwo2e.three"


def test_cdata():
    assert html_strip("<![CDATA[xyz]]>") == "xyz"
    assert html_strip("a<![CDATA[<b>]]>c") == "a<b>c"


def test_uppercase_entity_variants():
    # testUppercaseCharacterEntityVariants (subset): case-sensitive names
    assert html_strip("&Eacute;") == "É"
    assert html_strip("&eacute;") == "é"
