"""Public Suffix List registrable-domain extraction (VERDICT r13 #3)
as a GENERATED Catalyst expression — zero Python at runtime, zero
joins: the snapshot compiles into ``isin`` membership tests (Catalyst
optimizes literal IN-lists to hash-set ``InSet``), so eTLD+1 runs at
scan speed inside whole-stage codegen exactly like the rest of
operators/urls.py.

The data is a SNAPSHOT of the Mozilla Public Suffix List
(publicsuffix.org — public, CC-BY-SA-licensed data) curated to the
high-traffic entries: the full US locality grid (state / k12 / cc /
lib), the major ccTLD second-level registrars, the ICANN wildcard
ccTLDs with their exception rules, and the widely-used private-section
suffixes (github.io, blogspot.com, amazonaws zones, …). A production
deployment regenerates the tables from the live list with
``tools/gen_psl.py`` (VERDICT r14 #3), which parses the official
``public_suffix_list.dat`` format and writes ``operators/psl_data.py``
— when that module is present its flat rule tables REPLACE the curated
snapshot below (this module detects it at import). The MATCHING
algorithm is the complete PSL algorithm and is depth-generic, so a
regenerated snapshot needs no code change:

- a rule matches when it is a label-suffix of the host; ``*`` in a
  rule matches exactly one label;
- exception rules (``!www.ck``) beat every other match, and their
  public suffix is the rule minus its leftmost label;
- otherwise the matching rule with the MOST labels wins;
- no match → the public suffix is the last label (the implicit ``*``
  rule);
- registrable domain (eTLD+1) = public suffix + one more label; a host
  that IS a bare public suffix returns itself (total function — the
  callers group by this key and must never null out).

Rules up to 4 labels (the deepest in the snapshot, e.g.
``pvt.k12.ma.us``) compile in; the legacy registrar heuristic
(co/com/net/org/ac/gov/edu under a 2-letter ccTLD → three labels)
stays as the documented fallback BELOW every snapshot rule, covering
ccTLDs the snapshot doesn't enumerate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- snapshot data -------------------------------------------------

_US_STATES = (
    "al ak az ar ca co ct de dc fl ga gu hi id il in ia ks ky la me md "
    "ma mi mn ms mo mt ne nv nh nj nm ny nc nd oh ok or pa pr ri sc sd "
    "tn tx ut vt va vi wa wv wi wy"
).split()

_CC_SLD = {
    "uk": "co org me ltd plc net sch ac gov nhs police",
    "au": "com net org edu gov asn id",
    "nz": "co net org govt ac school geek gen kiwi maori iwi health mil",
    "za": "co net org gov edu ac web mil nom",
    "br": "com net org gov edu art blog eco emp far imb ind inf leg mil "
          "tv etc adv arq ato bio bmd cim cng cnt coz",
    "jp": "co ne or go ac ad ed gr lg",
    "in": "co net org gen firm ind gov ac edu res mil nic",
    "cn": "com net org gov edu ac mil",
    "mx": "com net org gob edu",
    "ar": "com net org gob edu int mil musica tur",
    "tr": "com net org gov edu k12 av bbs bel biz dr gen info mil name "
          "tel tv web",
    "kr": "co ne or re pe go mil ac hs ms es sc kg",
    "tw": "com net org edu gov idv game ebiz club mil",
    "hk": "com net org gov edu idv",
    "sg": "com net org gov edu per",
    "il": "co net org ac gov muni idf k12",
    "pl": "com net org edu gov info biz waw mil",
    "th": "co net or go ac in mi",
    "my": "com net org gov edu mil name",
    "id": "co net or go ac sch web my biz desa mil ponpes",
    "ph": "com net org gov edu ngo mil i",
    "vn": "com net org gov edu ac biz info name pro int health",
    "ua": "com net org gov edu in",
    "ru": "com net org gov edu ac int mil test",
    "ke": "co ne or go ac sc info me mobi",
    "ng": "com net org gov edu name sch mil mobi",
    "eg": "com net org gov edu name sci mil eun",
    "sa": "com net org gov edu med pub sch",
    "ae": "co net org gov ac sch mil",
    "pk": "com net org gov edu biz web fam gok gob gop gos info",
    "bd": "",  # wildcard ccTLD (below)
    "lk": "com net org gov edu int ac sch web ltd assn grp hotel soc",
    "np": "",  # wildcard ccTLD (below)
    "ec": "com net org gov edu fin info k12 med mil pro",
    "co": "com net org gov edu mil nom arts firm info int rec web",
    "ve": "com net org gob edu co info mil web arts firm int rec store "
          "tec",
    "pe": "com net org gob edu mil nom sld",
    "cl": "gob gov mil co",
    "uy": "com net org gub edu mil",
    "py": "com net org gov edu coop mil una",
    "bo": "com net org gob edu mil int tv web academia agro arte blog "
          "bolivia ciencia cooperativa democracia deporte",
    "do": "com net org gob edu gov mil sld web art",
    "gt": "com net org gob edu ind mil",
    "cr": "co fi go or sa ac ed",
    "ni": "com net org gob edu co ac biz info int mil nom web in",
    "hn": "com net org gob edu mil",
    "sv": "com org gob edu red",
    "pa": "com net org gob edu ac sld abo ing med nom",
    "cu": "com net org gov edu inf",
    "es": "com nom org gob edu",
    "pt": "com net org gov edu int publ nome",
    "it": "gov edu",
    "fr": "gouv asso nom prd tm avocat aeroport veterinaire",
    "gr": "com net org gov edu",
    "ro": "com www nom nt org rec store tm firm arts info",
    "rs": "co org edu ac gov in",
    "hr": "com iz from name",
    "ba": "com net org gov edu mil unbi unsa co rs",
    "bg": "",  # letter/digit SLDs, heuristic covers none — implicit *
    "hu": "co org info priv sport tm 2000 agrar bolt casino city erotica "
          "erotika film forum games hotel ingatlan jogasz konyvelo "
          "lakas media news reklam sex shop suli szex tozsde utazas "
          "video",
    "cz": "",
    "at": "co or gv ac priv",
    "ch": "",
    "be": "ac",
    "nl": "",
    "de": "",
    "se": "com org pp",
    "no": "",
    "dk": "",
    "fi": "aland",
    "ie": "gov",
    "is": "net com edu gov org int",
    "lt": "gov",
    "lv": "com net org gov edu mil asn conf id",
    "ee": "com org gov edu riik lib med fie aip",
    "by": "com gov mil of",
    "kz": "com net org gov edu mil",
    "ge": "com net org gov edu mil pvt",
    "am": "co com net org",
    "az": "com net org gov edu int mil name pro biz info pp",
    "md": "",
    "ma": "co net org gov ac press",
    "tn": "com net org gov edunet ens fin ind info intl mincom nat "
          "perso rnrt rns rnu tourism",
    "dz": "com net org gov edu asso pol art soc tm",
    "ly": "com net org gov edu sch med id plc",
    "zw": "co org gov ac mil",
    "zm": "com net org gov edu mil sch ac biz co info",
    "tz": "co ne or go ac sc hotel info me mil mobi tv",
    "ug": "co ne or go ac sc com org",
    "gh": "com org gov edu mil",
    "et": "com net org gov edu biz info name",
    "mz": "co net org gov edu ac adv",
    "ao": "co pb gv it og ed",
    "na": "com co",
    "bw": "co org",
    "ls": "co org gov net ac biz info sc",
    "mw": "com net org gov edu ac co biz coop int museum",
    "ca": "gc",
}

# the widely-used private-section suffixes (a site on one of these is
# its OWN registrable domain — per-site caps and politeness grouping
# must not merge all of github.io into one "site")
_PRIVATE = (
    # r15: the Blogspot regional family (each country mirror is a
    # separate private suffix in the PSL — without these, every UK
    # blog would collapse into one "blogspot.co.uk" site)
    "blogspot.co.uk",
    "blogspot.co.nz",
    "blogspot.co.za",
    "blogspot.com.au",
    "blogspot.com.br",
    "blogspot.com.ar",
    "blogspot.de",
    "blogspot.fr",
    "blogspot.it",
    "blogspot.in",
    "blogspot.jp",
    "blogspot.mx",
    "blogspot.nl",
    "blogspot.se",
    "blogspot.ca",
    "blogspot.ch",
    "blogspot.pt",
    "blogspot.ro",
    "blogspot.sg",
    "blogspot.tw",
    # r15: more high-traffic private-section hosts
    "elasticbeanstalk.com",
    "now.sh",
    "eu.org",
    "webflow.io",
    "codesandbox.io",
    "csb.app",
    "trafficmanager.net",
    "service.gov.uk",
    "hatenablog.com",
    "gitbook.io",
    "notion.site",
    "trycloudflare.com",
    "r2.dev",
    "streamlit.app",
    "railway.app",
    "github.io",
    "githubusercontent.com",
    "gitlab.io",
    "blogspot.com",
    "wordpress.com",
    "tumblr.com",
    "herokuapp.com",
    "netlify.app",
    "vercel.app",
    "pages.dev",
    "workers.dev",
    "web.app",
    "firebaseapp.com",
    "azurewebsites.net",
    "cloudapp.net",
    "appspot.com",
    "cloudfront.net",
    "cloudfunctions.net",
    "s3.amazonaws.com",
    "awsglobalaccelerator.com",
    "readthedocs.io",
    "neocities.org",
    "glitch.me",
    "repl.co",
    "fly.dev",
    "onrender.com",
    "surge.sh",
    "bitbucket.io",
    "codeberg.page",
    "hf.space",
    "deno.dev",
    "azurestaticapps.net",
    "ngrok.io",
    "linodeusercontent.com",
    "digitaloceanspaces.com",
    "wixsite.com",
    "squarespace.com",
    "myshopify.com",
    "weebly.com",
    "bandcamp.com",
    "dreamhosters.com",
    "duckdns.org",
    "no-ip.org",
    "dyndns.org",
    "pythonanywhere.com",
)

# ICANN wildcard ccTLDs (*.ck etc.): every 2-label tail under them is
# a public suffix, except the listed exception rules
_WILDCARD_BASES = ("bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg")
# deeper wildcard rules: *.compute.amazonaws.com style (base given)
_WILDCARD_DEEP_BASES = (
    "compute.amazonaws.com",
    "compute-1.amazonaws.com",
    "elb.amazonaws.com",
)
_EXCEPTIONS = ("www.ck",)  # !www.ck — www.ck is registrable, eTLD = ck

_SLD_FALLBACK = ("co", "com", "net", "org", "ac", "gov", "edu")


def _build_exact() -> frozenset[str]:
    out = set(_PRIVATE)
    for state in _US_STATES:
        out.add(f"{state}.us")
        for p in ("k12", "cc", "lib"):
            out.add(f"{p}.{state}.us")
    out.add("pvt.k12.ma.us")
    for cc, slds in _CC_SLD.items():
        for sld in slds.split():
            out.add(f"{sld}.{cc}")
    return frozenset(out)


# --- rule tables ----------------------------------------------------
# A regenerated snapshot (tools/gen_psl.py → operators/psl_data.py)
# replaces the curated tables wholesale: EXACT_RULES (multi-label
# exact rules), WILDCARD_BASES (the base under a ``*.`` rule — any
# depth), EXCEPTION_RULES (``!`` rules, bang stripped). The grouping
# below is depth-generic, so deeper generated rules need no code
# change (1-label exact rules are equivalent to the implicit ``*``
# default and are dropped by the generator).
try:  # pragma: no cover - exercised only when a snapshot is generated
    from .psl_data import (  # type: ignore[attr-defined]
        EXACT_RULES as _EXACT_SRC,
        EXCEPTION_RULES as _EXC_SRC,
        WILDCARD_BASES as _WILD_SRC,
    )

    _EXACT = frozenset(_EXACT_SRC)
    _WILD_BASES = tuple(_WILD_SRC)
    _EXCEPTIONS_ALL = tuple(_EXC_SRC)
except ImportError:
    _EXACT = _build_exact()
    _WILD_BASES = tuple(_WILDCARD_BASES) + tuple(_WILDCARD_DEEP_BASES)
    _EXCEPTIONS_ALL = _EXCEPTIONS


def _by_labels(items) -> dict[int, tuple[str, ...]]:
    out: dict[int, list[str]] = {}
    for s in items:
        out.setdefault(s.count(".") + 1, []).append(s)
    return {k: tuple(sorted(v)) for k, v in out.items()}


_EXACT_BY_K = _by_labels(s for s in _EXACT if s.count(".") >= 1)
# a ``*.base`` rule matches hosts whose last (base_labels + 1) labels
# end in base — keyed by the BASE label count (rule length = key + 1)
_WILD_BY_BASE_K = _by_labels(_WILD_BASES)
_EXC_BY_K = _by_labels(_EXCEPTIONS_ALL)
_RULE_KS = tuple(
    sorted(
        set(_EXACT_BY_K) | {bk + 1 for bk in _WILD_BY_BASE_K}
    )
)


def _lastk(parts: Column, k: int) -> Column:
    return F.concat_ws(".", F.slice(parts, -k, k))


def public_suffix_labels(host) -> Column:
    """Label count of the host's public suffix under the snapshot +
    the complete PSL matching algorithm (exceptions beat everything,
    then most-labels wins, implicit ``*`` default of 1)."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    expr = F.lit(1)
    # build bottom-up so higher-priority rules sit OUTERMOST:
    # fallback heuristic < wildcard/exact by ascending k < exceptions
    expr = F.when(
        (n >= 3)
        & F.element_at(parts, -2).isin(*_SLD_FALLBACK)
        & (F.length(F.element_at(parts, -1)) == 2),
        F.lit(2),
    ).otherwise(expr)
    for k in _RULE_KS:
        exact = _EXACT_BY_K.get(k)
        wild = _WILD_BY_BASE_K.get(k - 1)
        cond = None
        if exact:
            cond = (n >= k) & _lastk(parts, k).isin(*exact)
        if wild:
            wcond = (n >= k) & _lastk(parts, k - 1).isin(*wild)
            cond = wcond if cond is None else (cond | wcond)
        if cond is not None:
            expr = F.when(cond, F.lit(k)).otherwise(expr)
    for k in sorted(_EXC_BY_K):
        excs = _EXC_BY_K[k]
        expr = F.when(
            (n >= k) & _lastk(parts, k).isin(*excs), F.lit(k - 1)
        ).otherwise(expr)
    return expr


def registrable_domain(host) -> Column:
    """eTLD+1 per the PSL snapshot; a host that is itself a public
    suffix (or shorter) returns unchanged so the key stays total."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    ps = public_suffix_labels(h)
    take = ps + 1
    return F.when(
        n > ps, F.concat_ws(".", F.slice(parts, -take, take))
    ).otherwise(h)
