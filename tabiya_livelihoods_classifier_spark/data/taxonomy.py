"""ESCO-style taxonomy fixtures (FIXTURES.md §2) — deterministic, seeded.

Schemas are code-derived from the reference (SURVEY §1.4):
  occupations_augmented: occupation, preffered_label [sic — linker.py:56],
                         esco_code, uuid
  skills:                uuid, skills          (update_skills_...py:56-75)
  qualifications:        qualification, eqf_level
  taxo_{skills,occupations}: ID, PREFERREDLABEL, DESCRIPTION, UUIDHISTORY
                         (newline-joined, first=oldest, last=newest)
  {skill,occupation}_hierarchy: CHILDID, PARENTID  (multi-parent DAG + one
                         deliberate 2-cycle, per FIXTURES.md §2.5)
  occupation_to_skill_relations: occupation_id, skill_id, RELATIONTYPE
                         (blank fans into both essential+optional buckets,
                          3_2a...py:384-397)
"""

from __future__ import annotations

import random
import uuid as uuid_mod

import pandas as pd

from tabiya_livelihoods_classifier_spark.data.transcripts import entity_phrases


def _uuid(rng: random.Random) -> str:
    return str(uuid_mod.UUID(int=rng.getrandbits(128), version=4))


def generate_taxonomy(n_entities: int = 12, seed: int = 42) -> dict[str, pd.DataFrame]:
    """All fixture tables keyed by name. Pure function of (n_entities, seed)."""
    rng = random.Random(seed + 1)
    phrases = entity_phrases(n_entities, random.Random(seed))

    # --- occupations_augmented: 1 preferred + 2 alt labels per entity -----
    occ_rows = []
    occ_uuids = []
    for i, p in enumerate(phrases):
        u = _uuid(rng)
        occ_uuids.append(u)
        code = f"{1000 + i}.{i % 10}"
        alts = [p, f"{p} specialist", f"lead {p}"]
        for alt in alts:
            occ_rows.append((alt, p, code, u))
    occupations_augmented = pd.DataFrame(
        occ_rows, columns=["occupation", "preffered_label", "esco_code", "uuid"]
    )

    # --- skills (inference format): uuid = LAST element of UUIDHISTORY ----
    skill_labels = [f"operate {p.split()[1]} equipment" for p in phrases] + [
        f"plan {p.split()[2]} schedules" for p in phrases
    ]
    skill_rows = []
    taxo_skill_rows = []
    skill_ids = []
    for i, lab in enumerate(skill_labels):
        hist = [_uuid(rng) for _ in range(1 + i % 3)]  # 1..3 uuids
        sid = f"S{i:04d}"
        skill_ids.append(sid)
        skill_rows.append((hist[-1], lab))
        taxo_skill_rows.append((sid, lab, f"description of {lab}", "\n".join(hist)))
    skills = pd.DataFrame(skill_rows, columns=["uuid", "skills"])
    taxo_skills = pd.DataFrame(
        taxo_skill_rows, columns=["ID", "PREFERREDLABEL", "DESCRIPTION", "UUIDHISTORY"]
    )

    # --- taxonomy-format occupations --------------------------------------
    taxo_occ_rows = []
    occ_ids = []
    for i, p in enumerate(phrases):
        oid = f"O{i:04d}"
        occ_ids.append(oid)
        taxo_occ_rows.append(
            (oid, p, f"description of {p}", occ_uuids[i])
        )
    taxo_occupations = pd.DataFrame(
        taxo_occ_rows, columns=["ID", "PREFERREDLABEL", "DESCRIPTION", "UUIDHISTORY"]
    )

    # --- qualifications ----------------------------------------------------
    qual_rows = [
        (f"national certificate level {1 + i % 8}", float(1 + i % 8))
        for i in range(n_entities)
    ]
    qualifications = pd.DataFrame(qual_rows, columns=["qualification", "eqf_level"])

    # --- skill groups + hierarchy (multi-parent DAG, 3-level chain, 2-cycle)
    group_rows = []
    n_groups = max(4, n_entities // 3)
    for g in range(n_groups):
        group_rows.append(
            (f"G{g:03d}", f"skill group {g}", f"group {g} description", _uuid(rng))
        )
    skill_groups = pd.DataFrame(
        group_rows, columns=["ID", "PREFERREDLABEL", "DESCRIPTION", "UUIDHISTORY"]
    )
    hier_rows = []
    for i, sid in enumerate(skill_ids):
        hier_rows.append((sid, f"G{i % n_groups:03d}"))
        if i % 5 == 0:  # multi-parent node
            hier_rows.append((sid, f"G{(i + 1) % n_groups:03d}"))
    # 3-level chain among groups: G001 -> G000, G002 -> G001
    hier_rows.append(("G001", "G000"))
    hier_rows.append(("G002", "G001"))
    # deliberate 2-cycle (exercises cycle cut, 3_2b...py:478-480)
    hier_rows.append((f"G{n_groups - 1:03d}", f"G{n_groups - 2:03d}"))
    hier_rows.append((f"G{n_groups - 2:03d}", f"G{n_groups - 1:03d}"))
    skill_hierarchy = pd.DataFrame(hier_rows, columns=["CHILDID", "PARENTID"])

    # --- occupation -> skill relations (blank RELATIONTYPE fans to both) --
    rel_rows = []
    for i, oid in enumerate(occ_ids):
        rel_rows.append((oid, skill_ids[i], "essential"))
        rel_rows.append((oid, skill_ids[(i + n_entities) % len(skill_ids)], "optional"))
        if i % 4 == 0:
            rel_rows.append((oid, skill_ids[(i + 1) % len(skill_ids)], ""))
    occupation_to_skill_relations = pd.DataFrame(
        rel_rows, columns=["occupation_id", "skill_id", "RELATIONTYPE"]
    )

    return {
        "occupations_augmented": occupations_augmented,
        "skills": skills,
        "qualifications": qualifications,
        "taxo_skills": taxo_skills,
        "taxo_occupations": taxo_occupations,
        "skill_groups": skill_groups,
        "skill_hierarchy": skill_hierarchy,
        "occupation_to_skill_relations": occupation_to_skill_relations,
    }


def taxonomy_spark(spark, n_entities: int = 12, seed: int = 42):
    """Materialize every fixture table as a Spark DataFrame (dict by name)."""
    return {
        name: spark.createDataFrame(df)
        for name, df in generate_taxonomy(n_entities, seed).items()
    }
