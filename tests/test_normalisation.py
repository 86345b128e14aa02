"""Golden-value conformance tests for the normalisation kernels.

Value tables ported from the reference unit tests
(``warc-indexer/src/test/java/uk/bl/wa/util/NormalisationTest.java:30-244``).
"""

import pytest

from webarchive_discovery_ray.functions.normalisation import (
    canonicalise_host,
    canonicalise_url,
    fix_url_errors,
    resolve_relative,
    sanitise_warc_header_value,
    sha1_hash_as_base32,
)

SANITISE = [
    ("foo bar", "foo bar"),
    ("<foo bar", "<foo bar"),
    ("foo bar>", "foo bar>"),
    ("<foo bar>", "foo bar"),
    ("foo< >bar", "foo< >bar"),
    ("<foo< >bar>", "foo< >bar"),
]


@pytest.mark.parametrize("value,expected", SANITISE)
def test_sanitise_warc_header_value(value, expected):
    assert sanitise_warc_header_value(value) == expected


ENCODED_TRAILING_SLASH = [
    (
        "https://www.example.com/foo?param=https://www.example.com/other/",
        "http://example.com/foo?param=https://www.example.com/other",
    ),
    (
        "https://www.example.com/foo?param=https:%2F%2Fwww.example.com%2Fother%2F",
        "http://example.com/foo?param=https://www.example.com/other",
    ),
]


@pytest.mark.parametrize("url,expected", ENCODED_TRAILING_SLASH)
def test_encoded_trailing_slash(url, expected):
    assert canonicalise_url(url) == expected


RESOLVE_RELATIVE = [
    ("http://example.com/", "foo.html", "http://example.com/foo.html", True),
    ("http://example.com/bar/", "zoo/baz.html", "http://example.com/bar/zoo/baz.html", True),
    ("http://example.com/bar", "/zoo/baz.html", "http://example.com/zoo/baz.html", True),
    ("http://example.com/bar/zoo", "/", "http://example.com/", True),
    ("http://example.com/", "http://other.example.com", "http://other.example.com/", True),
    ("http://example.com/", "", "http://example.com/", True),
    ("http://example.com/foo|bar.html", "/top/", "http://example.com/top/", False),
    ("http://example.com/foo | bar/", "sub/", "http://example.com/foo%20|%20bar/sub", True),
    ("http://example.com/foo | bar/", "sub/", "http://example.com/foo | bar/sub/", False),
    ("http://example.com/faulty%g/gg", "sub", "http://example.com/faulty%25g/sub", True),
    ("http://example.com/faulty%g/gg", "sub", "http://example.com/faulty%g/sub", False),
    ("http://www.example.com/faulty%g/gg", "sub", "http://example.com/faulty%25g/sub", True),
    ("http://www.example.com/faulty%g/gg", "sub", "http://www.example.com/faulty%g/sub", False),
]


@pytest.mark.parametrize("base,rel,expected,normalise", RESOLVE_RELATIVE)
def test_resolve_relative(base, rel, expected, normalise):
    assert resolve_relative(base, rel, normalise) == expected


def test_www_remove_on_normalisation():
    assert canonicalise_url("http://www.example.com/", True, True) == "http://example.com/"


URL_NORMALISATION = [
    # input, ambiguous (allow_high_order=True, create_unambiguous=False), unambiguous (True, True)
    ("http://example.com", "http://example.com/", "http://example.com/"),
    ("http://example.com/", "http://example.com/", "http://example.com/"),
    ("https://example.com", "http://example.com/", "http://example.com/"),
    ("http://www.example.com", "http://www.example.com/", "http://example.com/"),
    ("https://www.example.com", "http://www.example.com/", "http://example.com/"),
    ("https://ww2.example.com", "http://ww2.example.com/", "http://example.com/"),
    ("https://www8.example.com", "http://www8.example.com/", "http://example.com/"),
    ("http://ww2.example.com", "http://ww2.example.com/", "http://example.com/"),
    ("/foo", "/foo", "/foo"),
    ("/foo/", "/foo", "/foo"),
    ("/%2A", "/%2a", "/*"),
    ("/%2a", "/%2a", "/*"),
    ("/%2a*", "/%2a*", "/**"),
    ("/æblegrød", "/æblegrød", "/æblegrød"),
    ("%C3%A6blegr%C3%B8d", "æblegrød", "æblegrød"),
    ("/æblegrød og øl", "/æblegrød%20og%20øl", "/æblegrød%20og%20øl"),
    ("Red, Rosé 14%", "red,%20rosé%2014%25", "red,%20rosé%2014%25"),
    ("Red%2C%20Ros%C3%A9 14%25", "red%2c%20rosé%2014%25", "red,%20rosé%2014%25"),
    ("/backslash\\", "/backslash%5c", "/backslash%5c"),
    ("/backslash%5C", "/backslash%5c", "/backslash%5c"),
]


@pytest.mark.parametrize("url,ambiguous,unambiguous", URL_NORMALISATION)
def test_url_normalisation(url, ambiguous, unambiguous):
    assert canonicalise_url(url, True, False) == ambiguous
    assert canonicalise_url(url, True, True) == unambiguous


FAULTY_HIGH_ORDER = [
    ("Red, Rosé 14%", "red,%20ros%c3%a9%2014%25", "red,%20rosé%2014%25"),
    ("red,%20ros%c3%a9%2014%25", "red,%20ros%c3%a9%2014%25", "red,%20rosé%2014%25"),
]


@pytest.mark.parametrize("url,escaped,unescaped", FAULTY_HIGH_ORDER)
def test_faulty_high_order(url, escaped, unescaped):
    assert canonicalise_url(url, False, True) == escaped
    assert canonicalise_url(url, True, True) == unescaped


NON_UTF8 = [
    ("http://example.com/%C3%86blegr%C3%B8d", "http://example.com/Æblegrød"),
    ("http://example.com/%C3%86blegr%C3", "http://example.com/Æblegr%c3"),
    ("http://example.com/Æblegrød", "http://example.com/æblegrød"),
    ("http://example.com/%C6blegr%F8d", "http://example.com/%c6blegr%f8d"),
    ("http://www.example.com/%C6blegr%F8d", "http://example.com/%c6blegr%f8d"),
]


@pytest.mark.parametrize("url,expected", NON_UTF8)
def test_non_utf8_escapes(url, expected):
    assert canonicalise_url(url) == expected


ESCAPE_FIX = [
    ("http://example.com/%", "http://example.com/%25"),
    ("http://example.com/%%25", "http://example.com/%25%25"),
    ("http://example.com/10% proof", "http://example.com/10%25%20proof"),
    ("http://example.com/%a%2A", "http://example.com/%25a%2a"),
    ("http://example.com/%g1%2A", "http://example.com/%25g1%2a"),
    ("http://example.com/foo|bar", "http://example.com/foo|bar"),
    ("http://www.example.com/foo|bar", "http://example.com/foo|bar"),
]


@pytest.mark.parametrize("url,expected", ESCAPE_FIX)
def test_escape_fix(url, expected):
    assert fix_url_errors(url) == expected


SPACE = [
    ("http://example.com/%20 +path", "http://example.com/%20%20+path"),
    ("http://example.com/+%20 path", "http://example.com/+%20%20path"),
    ("http://example.com/path?foo=%20 +", "http://example.com/path?foo=+++"),
    ("http://example.com/%20 +path?foo=%20 +", "http://example.com/%20%20+path?foo=+++"),
    ("http://example.com/+%20 path?foo=+%20 ", "http://example.com/+%20%20path?foo=+++"),
]


@pytest.mark.parametrize("url,expected", SPACE)
def test_space(url, expected):
    assert canonicalise_url(url) == expected


FAULTY_HARD = [
    ("http://example.com/%", "http://example.com/%25"),
    ("http://example.com/%%25", "http://example.com/%25%25"),
    ("http://example.com/10% proof", "http://example.com/10%25%20proof"),
    ("http://example.com/%a%2A", "http://example.com/%25a*"),
    ("http://example.com/%g1%2A", "http://example.com/%25g1*"),
    ("http://example.com/hash#%23", "http://example.com/hash#%23"),
]


@pytest.mark.parametrize("url,expected", FAULTY_HARD)
def test_faulty_hard(url, expected):
    assert canonicalise_url(url) == expected


CANONICALISE_HOST = [
    ("http://example.com/", "example.com"),
    ("http://example.com", "example.com"),
    ("http://example.com ", "example.com"),
    ("https://example.com/", "example.com"),
    ("https://example.com", "example.com"),
    ("https://example.com ", "example.com"),
    # LinkExtractorTest.java:testExtractDomainFromFullURL expectation:
    ("fourth.whatever.example.com", "fourth.whatever.example.com"),
    # 'any leading www will be stripped by this point' (LinkExtractorTest):
    ("www.bbc.co.uk", "bbc.co.uk"),
]


@pytest.mark.parametrize("host,expected", CANONICALISE_HOST)
def test_canonicalise_host(host, expected):
    assert canonicalise_host(host) == expected


def test_sha1_base16_to_base32():
    b16 = "sha1:5a3311bde611032119d6080eebf83a4a3b3475ed"
    b32 = "sha1:LIZRDPPGCEBSCGOWBAHOX6B2JI5TI5PN"
    assert sha1_hash_as_base32(b16) == b32
    # non-sha1 inputs pass through unchanged
    assert sha1_hash_as_base32("md5:abc") == "md5:abc"
    assert sha1_hash_as_base32(None) is None


def test_fast_path_matches_escape_state_machine():
    """canonicalise_url's ASCII fast path must agree byte-for-byte with the
    full escape state machine (the ported source of truth) on random URLs
    mixing safe chars, escapes, spaces, backslashes and non-ASCII."""
    import random
    import string

    import webarchive_discovery_ray.functions.normalisation as N

    def slow(url):
        u = N._wayback_canonicalize(url)
        if u.startswith("https://"):
            u = "http://" + u[8:]
        m = N._WWW_PREFIX.fullmatch(u)
        if m:
            u = m.group(1) + m.group(2)
        raw = N._fix_escape_errors_and_unescape_high_order(u)
        u = N._escape_utf8(raw, escape_high_order=False, normalise_low_order=True)
        while u.endswith("/"):
            u = u[:-1]
        if N._DOMAIN_ONLY.fullmatch(u):
            u += "/"
        return u

    rng = random.Random(42)
    chars = string.ascii_letters + string.digits + "/:.?&=#%\\ -_~" + "é漢"
    for _ in range(3000):
        u = "http://" + "".join(rng.choice(chars) for _ in range(rng.randint(5, 60)))
        assert N.canonicalise_url(u) == slow(u), u
