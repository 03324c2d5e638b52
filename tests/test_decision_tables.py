"""Exhaustive unit tests of the reference decision tables (FIXTURES.md F3)."""

import itertools

import pytest

from entity_extractor_ray.functions import decision_tables as dt


class TestTagMap:
    def test_pfas(self):
        assert dt.pfas_status_from_tag("PFAS") == "YES"

    def test_no_pfas(self):
        assert dt.pfas_status_from_tag("NO_PFAS") == "NO"

    def test_pending(self):
        assert dt.pfas_status_from_tag("PENDING") == "PENDING"

    def test_unknown_and_none(self):
        assert dt.pfas_status_from_tag("WHAT") == "PENDING"
        assert dt.pfas_status_from_tag(None) == "PENDING"


class TestStatusLattice:
    def test_empty_children_is_no(self):
        status, source = dt.parent_pfas_resolution([])
        assert status == "NO" and source is None

    def test_any_yes_wins(self):
        for combo in itertools.product(["YES", "NO", "PENDING"], repeat=3):
            if "YES" in combo:
                status, _ = dt.parent_pfas_resolution([(s, "VAI") for s in combo])
                assert status == "YES", combo

    def test_no_pending_no_yes_is_no(self):
        status, _ = dt.parent_pfas_resolution([("NO", "VAI"), ("NO", "OECD")])
        assert status == "NO"

    def test_else_pending(self):
        status, _ = dt.parent_pfas_resolution([("NO", "VAI"), ("PENDING", "OECD")])
        assert status == "PENDING"

    def test_full_truth_table_size_1_to_3(self):
        for n in (1, 2, 3):
            for combo in itertools.product(["YES", "NO", "PENDING"], repeat=n):
                status, _ = dt.parent_pfas_resolution([(s, "VAI") for s in combo])
                if "YES" in combo:
                    assert status == "YES"
                elif "PENDING" in combo:
                    assert status == "PENDING"
                else:
                    assert status == "NO"


class TestSourceVote:
    def test_pending_prefers_oecd(self):
        status, source = dt.parent_pfas_resolution(
            [("PENDING", "MANUAL"), ("PENDING", "OECD"), ("PENDING", "VAI")]
        )
        assert status == "PENDING" and source == "OECD"

    def test_non_pending_prefers_vai(self):
        status, source = dt.parent_pfas_resolution(
            [("YES", "OECD"), ("YES", "VAI"), ("NO", "MANUAL")]
        )
        assert status == "YES" and source == "VAI"

    def test_only_matching_status_votes(self):
        # the OECD child has status NO != parent YES, so it cannot vote
        status, source = dt.parent_pfas_resolution([("YES", "MANUAL"), ("NO", "OECD")])
        assert status == "YES" and source == "MANUAL"

    def test_no_voter_gives_none(self):
        # parent resolves YES; the only YES child has an unlisted source
        status, source = dt.parent_pfas_resolution([("YES", "ECHA")])
        assert status == "YES" and source is None

    def test_tie_broken_by_preference_not_count(self):
        status, source = dt.parent_pfas_resolution(
            [("NO", "MANUAL"), ("NO", "MANUAL"), ("NO", "OECD")]
        )
        assert status == "NO" and source == "OECD"  # OECD > MANUAL despite count

    def test_pending_vote_order_full(self):
        status, source = dt.parent_pfas_resolution(
            [("PENDING", "VAI"), ("PENDING", "MANUAL")]
        )
        assert source == "VAI"  # no OECD -> VAI next


class TestTransitionMap:
    EXPECTED = {
        ("OPENAI", "OPENAI"): "VAI",
        ("MANUAL", "OPENAI"): "MANUAL",
        ("OECD", "OPENAI"): "OECD",
        ("NONE", "OPENAI"): "VAI",
        ("OPENAI", "MANUAL"): "MANUAL",
        ("MANUAL", "MANUAL"): "MANUAL",
        ("NONE", "MANUAL"): "MANUAL",
        ("OPENAI", "OECD"): "OECD",
        ("OECD", "OECD"): "OECD",
        ("NONE", "OECD"): "OECD",
        ("OPENAI", "NONE"): "VAI",
        ("MANUAL", "NONE"): "MANUAL",
        ("OECD", "NONE"): "OECD",
        ("NONE", "NONE"): "NONE",
    }

    def test_all_14_valid_entries(self):
        for (existing, new), want in self.EXPECTED.items():
            assert dt.final_source(existing, new) == want

    def test_impossible_transitions_raise(self):
        with pytest.raises(dt.TransitionError):
            dt.final_source("OECD", "MANUAL")
        with pytest.raises(dt.TransitionError):
            dt.final_source("MANUAL", "OECD")

    def test_vai_total_extension(self):
        assert dt.final_source("VAI", "OPENAI") == "VAI"
        assert dt.final_source("VAI", "MANUAL") == "MANUAL"
        assert dt.final_source("VAI", "OECD") == "OECD"
        assert dt.final_source("VAI", "NONE") == "VAI"


class TestStatusWhitelist:
    def test_whitelisted_updates(self):
        for pair in [("OECD", "VAI"), ("VAI", "VAI"), ("NONE", "VAI"),
                     ("VAI", "MANUAL"), ("NONE", "MANUAL"),
                     ("VAI", "OECD"), ("NONE", "OECD")]:
            assert dt.final_status(pair[0], pair[1], "NO", "YES") == "YES"

    def test_non_whitelisted_keeps_existing(self):
        assert dt.final_status("MANUAL", "OPENAI", "NO", "YES") == "NO"
        assert dt.final_status("OECD", "OPENAI", "NO", "YES") == "NO"
        assert dt.final_status("MANUAL", "MANUAL", "NO", "YES") == "NO"


class TestFoldChemical:
    def test_single_mention_creates(self):
        status, source = dt.fold_chemical_mentions([("PFAS", "OPENAI")])
        assert status == "YES" and source == "OPENAI"

    def test_two_openai_mentions_fold_to_vai(self):
        status, source = dt.fold_chemical_mentions(
            [("NO_PFAS", "OPENAI"), ("PFAS", "OPENAI")]
        )
        # second mention: source OPENAI_OPENAI -> VAI; status update requires
        # (OPENAI, OPENAI) in whitelist -> it is NOT, so status stays NO
        assert status == "NO" and source == "VAI"

    def test_third_mention_uses_extension(self):
        status, source = dt.fold_chemical_mentions(
            [("NO_PFAS", "OPENAI"), ("PFAS", "OPENAI"), ("PFAS", "OPENAI")]
        )
        # third: existing source VAI, new OPENAI -> stays VAI; whitelist has
        # (VAI, VAI)... the new source is OPENAI so (VAI, OPENAI) not listed
        assert source == "VAI" and status == "NO"

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            dt.fold_chemical_mentions([])


class TestNameKeys:
    def test_normalize(self):
        assert dt.normalize_name_key("Foo  Bar baz") == "foobarbaz"
        assert dt.normalize_name_key(None) == ""

    def test_blank(self):
        assert dt.is_blank_name("   ")
        assert dt.is_blank_name(None)
        assert not dt.is_blank_name("x")

    def test_combine_material_name(self):
        assert dt.combine_material_name("M", "P1", "U1") == "M (P1) (U1)"
        assert dt.combine_material_name("M", None, "U1") == "M (U1)"
        assert dt.combine_material_name("M", "  ", None) == "M"

    def test_normalize_cas(self):
        assert dt.normalize_cas(" 50-00-0 ") == "50-00-0"
        assert dt.normalize_cas("   ") is None
        assert dt.normalize_cas(None) is None


class TestChemicalDedup:
    def test_last_wins_first_key_order(self):
        chems = [
            {"chemical_name": "A", "v": 1},
            {"chemical_name": "B", "v": 2},
            {"chemical_name": "A", "v": 3},
        ]
        out = dt.dedup_chemicals_last_wins(chems)
        assert [c["chemical_name"] for c in out] == ["A", "B"]
        assert out[0]["v"] == 3
