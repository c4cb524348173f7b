"""Public name lexicon for the NER scrub stand-in.

The reference scrubs names with scrubadub + TextBlobNameDetector
(/root/reference/SMParser/smparserbase.py:74-79); neither library ships
in this container, so the detector is lexicon-gated (functions/scrub.py)
and this module supplies the lexicon: ~600 of the most common US given
names — the kind of list the Census Bureau / SSA publish yearly (public
knowledge, reproduced from memory, deterministically ordered). A real
deployment swaps the detector seam for scrubadub; the lexicon path
stays useful as a cheap pre-filter.

``PLANT_FIRST`` / ``PLANT_LAST`` are small slices used by the
ner_coverage gate entry to PLANT full names deterministically into the
synthetic corpus — both engines re-derive the same plantings, so the
audit is cross-engine value-checked (see __spark_entry__.q_ner_coverage).
"""

from __future__ import annotations

# Top US given names (SSA-style popular-name lists; public knowledge).
TOP_FIRST_NAMES: tuple[str, ...] = tuple("""
james john robert michael william david richard joseph thomas charles
christopher daniel matthew anthony mark donald steven paul andrew joshua
kenneth kevin brian george timothy ronald edward jason jeffrey ryan
jacob gary nicholas eric jonathan stephen larry justin scott brandon
benjamin samuel gregory alexander patrick frank raymond jack dennis
jerry tyler aaron jose adam nathan henry douglas zachary peter kyle
noah ethan jeremy walter christian keith roger terry austin sean gerald
carl harold dylan arthur lawrence jordan jesse bryan billy bruce gabriel
joe logan alan juan albert willie elijah wayne randy vincent mason roy
ralph bobby russell bradley philip eugene louis harry vernon caleb
martin stanley leonard dale manuel rodney curtis norman allen marvin
glenn jeffery travis chad jared gordon dustin derek morgan craig alfred
clifford jay victor clarence sam liam lucas oliver owen luke leo levi
wyatt isaac landon miles axel declan weston everett luca maverick ezra
mary patricia jennifer linda elizabeth barbara susan jessica sarah karen
lisa nancy betty margaret sandra ashley kimberly emily donna michelle
carol amanda dorothy melissa deborah stephanie rebecca sharon laura
cynthia kathleen amy angela shirley anna brenda pamela emma nicole
helen samantha katherine christine debra rachel carolyn janet catherine
maria heather diane ruth julie olivia joyce virginia victoria kelly
lauren christina joan evelyn judith megan andrea cheryl hannah jacqueline
martha gloria teresa ann sara madison frances kathryn janice jean abigail
alice julia judy sophia grace denise amber doris marilyn danielle beverly
isabella theresa diana natalie brittany charlotte marie kayla alexis lori
rose tammy sylvia josephine ella mia amelia harper evelyn avery scarlett
eleanor chloe layla penelope riley zoey nora lily hazel violet aurora
savannah audrey brooklyn bella claire skylar lucy paisley everly anaya
caroline genesis kennedy sadie gianna willow naomi ivy elena emilia
maggie george peter kevin brian henry alexa adrian alejandro alexandra
xavier quentin sebastian santiago mateo leonardo gael atlas kai rowan
finn silas beau jude ezekiel titus koa zane cruz remy otis amos duke
""".split())

# Honorific-anchored detection catches names OUTSIDE the lexicon: a
# capitalized token after Mr/Mrs/Ms/Miss/Dr/Prof/Rev/Sir is a name by
# construction regardless of frequency lists.
HONORIFICS: tuple[str, ...] = (
    "Mr", "Mrs", "Ms", "Miss", "Dr", "Prof", "Rev", "Sir", "Madam",
)

# Deterministic planting slices for the ner_coverage gate entry:
# PLANT_FIRST are all in TOP_FIRST_NAMES (lexicon path must catch them),
# PLANT_LAST are surnames (never required to be in any lexicon — the
# span-fold rule catches the surname position).
PLANT_FIRST: tuple[str, ...] = (
    "Maria", "David", "Hannah", "Xavier", "Oliver", "Scarlett", "Amos",
)
PLANT_LAST: tuple[str, ...] = (
    "Jones", "Okafor", "Lindqvist", "Quill", "Nakamura",
)


def name_lexicon() -> frozenset[str]:
    """Lowercased lexicon set (deterministic; built once per worker)."""
    return frozenset(n.lower() for n in TOP_FIRST_NAMES)
