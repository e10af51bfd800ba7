"""Token-level golden tests pinning the analyzer-chain semantics
(SURVEY.md §1.4; reference analyzers Domain/Repository/Lucene/Analyzer/*.cs)."""

from ds_discovery_opensearch_taxonomy_spark.functions.analysis import (
    analyze,
    analyze_terms,
    ascii_fold,
    classic_tokenize,
    strip_possessive,
    word_delimiter_expand,
)

NOCAS = "textnocasnopunc"
GEN = "text_gen"
CAS = "textcasnopunc"
CASPUNC = "textcaspunc"


class TestClassicTokenizer:
    def test_plain_words(self):
        assert classic_tokenize("votes for women") == ["votes", "for", "women"]

    def test_punctuation_delimits(self):
        assert classic_tokenize("Air Ministry: Allied, (Air)") == [
            "Air",
            "Ministry",
            "Allied",
            "Air",
        ]

    def test_apostrophe_kept(self):
        assert classic_tokenize("women's suffrage") == ["women's", "suffrage"]
        assert classic_tokenize("O'Neil's") == ["O'Neil's"]

    def test_hyphen_without_digit_splits(self):
        # NUM needs a digit; letter-letter hyphenation splits
        assert classic_tokenize("Czech-oslovakia") == ["Czech", "oslovakia"]

    def test_num_with_digits_kept(self):
        assert classic_tokenize("AIR 37/177") == ["AIR", "37/177"]
        assert classic_tokenize("1-800-FLOWERS") == ["1-800-FLOWERS"]
        assert classic_tokenize("1,000") == ["1,000"]

    def test_host(self):
        assert classic_tokenize("www.example.com") == ["www.example.com"]

    def test_acronym_host_boundary(self):
        # no trailing dot -> HOST-shaped, token kept whole
        assert classic_tokenize("E.E.C") == ["E.E.C"]
        # trailing dot -> ACRONYM (longest match wins over HOST)
        assert classic_tokenize("E.E.C. rules") == ["E.E.C.", "rules"]

    def test_email_and_company(self):
        assert classic_tokenize("bob@example.com") == ["bob@example.com"]
        assert classic_tokenize("AT&T") == ["AT&T"]

    def test_invalid_hostnum_rescans(self):
        assert classic_tokenize("foo_bar") == ["foo", "bar"]
        assert classic_tokenize("foo.bar_1") == ["foo.bar", "1"]
        assert classic_tokenize("snake_case_name") == ["snake", "case", "name"]

    def test_mixed_code_identifiers(self):
        assert classic_tokenize("def tokenize_batch(x):") == [
            "def",
            "tokenize",
            "batch",
            "x",
        ]


class TestWordDelimiter:
    def test_simple_passthrough(self):
        assert word_delimiter_expand("women") == [("women", 1)]
        assert word_delimiter_expand("372") == [("372", 1)]

    def test_hyphen_token(self):
        # original(p), parts(p, p+1), catenation at last part's position
        assert word_delimiter_expand("Czech-oslovakia") == [
            ("Czech-oslovakia", 1),
            ("Czech", 0),
            ("oslovakia", 1),
            ("Czechoslovakia", 0),
        ]

    def test_case_transition(self):
        assert word_delimiter_expand("tEst") == [
            ("tEst", 1),
            ("t", 0),
            ("Est", 1),
            ("tEst", 0),
        ]

    def test_upper_run_then_capitalized(self):
        assert word_delimiter_expand("ABCDef") == [
            ("ABCDef", 1),
            ("ABC", 0),
            ("Def", 1),
            ("ABCDef", 0),
        ]

    def test_alpha_digit_split(self):
        assert word_delimiter_expand("WO372") == [
            ("WO372", 1),
            ("WO", 0),
            ("372", 1),
        ]

    def test_num_token(self):
        assert word_delimiter_expand("37/177") == [
            ("37/177", 1),
            ("37", 0),
            ("177", 1),
        ]

    def test_possessive_subword(self):
        assert word_delimiter_expand("women's") == [
            ("women's", 1),
            ("women", 0),
        ]

    def test_apostrophe_name(self):
        assert word_delimiter_expand("O'Neil's") == [
            ("O'Neil's", 1),
            ("O", 0),
            ("Neil", 1),
            ("ONeil", 0),
        ]

    def test_contraction(self):
        assert word_delimiter_expand("don't") == [
            ("don't", 1),
            ("don", 0),
            ("t", 1),
            ("dont", 0),
        ]

    def test_alpha_runs_broken_by_digits(self):
        assert word_delimiter_expand("wi-fi-2000") == [
            ("wi-fi-2000", 1),
            ("wi", 0),
            ("fi", 1),
            ("wifi", 0),
            ("2000", 1),
        ]


class TestFilters:
    def test_fold(self):
        assert ascii_fold("Ottomán") == "Ottoman"
        assert ascii_fold("café") == "cafe"
        assert ascii_fold("Łódź") == "Lodz"

    def test_possessive(self):
        assert strip_possessive("women's") == "women"
        assert strip_possessive("women’s") == "women"
        assert strip_possessive("its") == "its"


class TestChains:
    def test_default_chain_positions(self):
        # ClassicTokenizer already splits letter-hyphen-letter (NUM needs a
        # digit), so WDF sees two plain tokens
        assert analyze(NOCAS, "Czech-oslovakia today") == [
            ("czech", 0),
            ("oslovakia", 1),
            ("today", 2),
        ]

    def test_wdf_reached_via_case_transition(self):
        # WDF expansion happens for tokens the classic grammar keeps whole
        assert analyze(NOCAS, "PowerShot x") == [
            ("powershot", 0),
            ("power", 0),
            ("shot", 1),
            ("powershot", 1),
            ("x", 2),
        ]

    def test_eec(self):
        assert analyze(NOCAS, "E.E.C") == [
            ("e.e.c", 0),
            ("e", 0),
            ("e", 1),
            ("c", 2),
            ("eec", 2),
        ]

    def test_womens(self):
        # original survives possessive-strip -> duplicate at same position
        assert analyze(NOCAS, "women's suffrage") == [
            ("women", 0),
            ("women", 0),
            ("suffrage", 1),
        ]

    def test_accents_folded_lowercased(self):
        assert analyze_terms(NOCAS, "Ottomán Empire") == ["ottoman", "empire"]

    def test_air_ref(self):
        assert analyze(NOCAS, "AIR 37/177") == [
            ("air", 0),
            ("37/177", 1),
            ("37", 1),
            ("177", 2),
        ]

    def test_case_sensitive_chain(self):
        assert analyze_terms(CAS, "LOCOG arsenal") == ["LOCOG", "arsenal"]

    def test_caspunc_whitespace_only(self):
        assert analyze(CASPUNC, 'Royal "Arsenal": kept-as-is') == [
            ("Royal", 0),
            ('"Arsenal":', 1),
            ("kept-as-is", 2),
        ]

    def test_gen_vs_nocas_fold_order(self):
        # ß lowers to ß then folds to ss (gen) vs folds to ss then lowers
        assert analyze_terms(GEN, "Straße") == ["strasse"]
        assert analyze_terms(NOCAS, "Straße") == ["strasse"]

    def test_reference_air_doc_tokens(self):
        # slice of the reference test document (ElasticCategoriserRepositoryTest.cs:166-179)
        text = 'Air Ministry: Allied Expeditionary Air Force'
        assert analyze_terms(NOCAS, text) == [
            "air",
            "ministry",
            "allied",
            "expeditionary",
            "air",
            "force",
        ]
