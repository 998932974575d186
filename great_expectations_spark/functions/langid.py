"""Character-n-gram language identification (Cavnar–Trenkle rank-order).

Implements the classic "N-Gram-Based Text Categorization" classifier
(Cavnar & Trenkle, SDAIR'94 — public method): each language has a profile
of its top-K character n-grams ranked by frequency; a document is scored
against each profile by the *out-of-place* distance (sum over the
document's ranked grams of |doc_rank - profile_rank|, with a fixed K
penalty for grams absent from the profile) and classified as the argmin.

Profiles are built at import from embedded seed texts (common natural
sentences authored for this module — no external data), which keeps the
classifier fully deterministic and dependency-free.  Twenty languages
including the classically confusable pairs es/pt, da/no, sv/da and the
Slavic Latin pair cs/pl; Cyrillic (ru) and Greek (el) separate on script
alone.

Execution model: the classifier runs as an Arrow-batched pandas UDF
(``language_id_ct``) — one Python invocation per Arrow batch, no per-row
Python UDF.  Inside the batch the hot path is fully vectorized
(``classify_np``): grams are packed into left-aligned 21-bit-per-char
int64 keys (numeric order == string order, so ranking tie-breaks are
bit-identical to the scalar reference), counted with ``np.unique``, and
scored against a [grams × languages] rank matrix via one ``searchsorted``
+ one masked |diff| reduction — no per-gram dict lookups.  The scalar
``classify`` remains the reference implementation the vector path is
parity-tested against.  Embarrassingly parallel, no shuffle: the 100 TB
plan is a pure mapInArrow-style projection.

Replaces the round-2 4-language stopword argmax (``text.language_id``)
as the quality path; the stopword version remains for its SQL-replica
oracle.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

PROFILE_DEPTH = 400  # K: profile size and out-of-place penalty
DOC_DEPTH = 400      # M: document profile size
MAX_CHARS = 2000     # classification needs only a prefix

# Seed texts: a handful of natural sentences per language (common
# vocabulary, standard orthography).  ~60-80 words is plenty for 1-3-gram
# profiles at this depth.
SEED_TEXTS: Dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog. it was the best of "
        "times and it was the worst of times. we hold these truths to be "
        "self evident that all men are created equal. she said that she "
        "would come home when the work was finished. there is nothing "
        "either good or bad but thinking makes it so."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso. era el "
        "mejor de los tiempos y era el peor de los tiempos. sostenemos "
        "como evidentes estas verdades que todos los hombres son creados "
        "iguales. ella dijo que volvería a casa cuando terminara el "
        "trabajo. no hay nada bueno ni malo pero el pensamiento lo hace "
        "así."
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso. era o "
        "melhor dos tempos e era o pior dos tempos. consideramos estas "
        "verdades evidentes que todos os homens são criados iguais. ela "
        "disse que voltaria para casa quando o trabalho estivesse "
        "terminado. não há nada de bom nem de mau mas o pensamento o faz "
        "assim."
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux. "
        "c'était le meilleur des temps et c'était le pire des temps. nous "
        "tenons ces vérités pour évidentes que tous les hommes sont créés "
        "égaux. elle a dit qu'elle rentrerait à la maison quand le "
        "travail serait terminé. il n'y a rien de bon ni de mauvais mais "
        "la pensée le rend ainsi."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund. es war "
        "die beste und die schlimmste aller zeiten. wir halten diese "
        "wahrheiten für selbstverständlich dass alle menschen gleich "
        "geschaffen sind. sie sagte dass sie nach hause kommen würde wenn "
        "die arbeit beendet wäre. es gibt nichts gutes oder schlechtes "
        "nur das denken macht es dazu."
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro. era il "
        "migliore dei tempi ed era il peggiore dei tempi. riteniamo "
        "queste verità evidenti che tutti gli uomini sono creati uguali. "
        "lei disse che sarebbe tornata a casa quando il lavoro fosse "
        "finito. non c'è niente di buono o di cattivo ma è il pensiero "
        "che lo rende tale."
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond. het was de beste "
        "en het was de slechtste van alle tijden. wij beschouwen deze "
        "waarheden als vanzelfsprekend dat alle mensen gelijk geschapen "
        "zijn. zij zei dat ze naar huis zou komen wanneer het werk klaar "
        "was. er is niets goed of slecht maar het denken maakt het zo."
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden. det var den "
        "bästa och den värsta av tider. vi anser att dessa sanningar är "
        "självklara att alla människor är skapade lika. hon sade att hon "
        "skulle komma hem när arbetet var färdigt. det finns ingenting "
        "gott eller ont men tanken gör det så. regeringen vill genomföra "
        "flera nya åtgärder för att stärka utbildning och hälsa i "
        "kommunerna. de gick genom staden och pratade om hur de skulle "
        "göra arbetet färdigt."
    ),
    "da": (
        "den hurtige brune ræv springer over den dovne hund. det var den "
        "bedste og den værste af tider. vi anser disse sandheder for "
        "selvindlysende at alle mennesker er skabt lige. hun sagde at hun "
        "ville komme hjem når arbejdet var færdigt. der er ikke noget "
        "godt eller ondt men tanken gør det sådan. jeg kan godt lide at "
        "læse bøger om efteråret. regeringen vil gennemføre flere nye "
        "foranstaltninger for at styrke uddannelse og sundhed i "
        "kommunerne. de gik gennem byen og talte om hvordan de skulle "
        "gøre arbejdet færdigt."
    ),
    "no": (
        "den raske brune reven hopper over den late hunden. det var den "
        "beste og den verste av tider. vi anser disse sannhetene som "
        "selvinnlysende at alle mennesker er skapt like. hun sa at hun "
        "ville komme hjem når arbeidet var ferdig. det finnes ikke noe "
        "godt eller ondt men tanken gjør det slik. jeg liker å lese bøker "
        "om høsten. regjeringen vil gjennomføre flere nye tiltak for å "
        "styrke utdanning og helse i kommunene. de gikk gjennom byen og "
        "snakket om hvordan de skulle gjøre arbeidet ferdig."
    ),
    "fi": (
        "nopea ruskea kettu hyppää laiskan koiran yli. se oli aikojen "
        "paras ja aikojen pahin. pidämme näitä totuuksia itsestään "
        "selvinä että kaikki ihmiset on luotu tasa arvoisiksi. hän sanoi "
        "että hän tulisi kotiin kun työ olisi valmis. ei ole mitään hyvää "
        "tai pahaa mutta ajattelu tekee siitä sellaisen."
    ),
    "pl": (
        "szybki brązowy lis przeskakuje nad leniwym psem. to były "
        "najlepsze czasy i to były najgorsze czasy. uważamy te prawdy za "
        "oczywiste że wszyscy ludzie są stworzeni równymi. powiedziała że "
        "wróci do domu kiedy praca będzie skończona. nie ma nic dobrego "
        "ani złego ale myślenie czyni to takim."
    ),
    "cs": (
        "rychlá hnědá liška skáče přes líného psa. byly to nejlepší časy "
        "a byly to nejhorší časy. považujeme tyto pravdy za samozřejmé že "
        "všichni lidé jsou stvořeni sobě rovni. řekla že se vrátí domů až "
        "bude práce hotová. není nic dobrého ani špatného ale myšlení to "
        "tak dělá."
    ),
    "ro": (
        "vulpea maro rapidă sare peste câinele leneș. au fost cele mai "
        "bune vremuri și au fost cele mai rele vremuri. considerăm aceste "
        "adevăruri evidente că toți oamenii sunt creați egali. ea a spus "
        "că se va întoarce acasă când munca va fi terminată. nu există "
        "nimic bun sau rău dar gândirea îl face astfel."
    ),
    "hu": (
        "a gyors barna róka átugrik a lusta kutya felett. ezek voltak a "
        "legjobb idők és ezek voltak a legrosszabb idők. magától "
        "értetődőnek tartjuk ezeket az igazságokat hogy minden ember "
        "egyenlőnek teremtetett. azt mondta hogy hazajön amikor a munka "
        "befejeződik. nincs semmi jó vagy rossz de a gondolkodás teszi "
        "azzá."
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar. "
        "zamanların en iyisiydi ve zamanların en kötüsüydü. bütün "
        "insanların eşit yaratıldığı gerçeğini apaçık kabul ediyoruz. işi "
        "bittiğinde eve geleceğini söyledi. iyi ya da kötü diye bir şey "
        "yoktur ama düşünce onu öyle yapar."
    ),
    "id": (
        "rubah coklat yang cepat melompati anjing yang malas. itu adalah "
        "masa terbaik dan itu adalah masa terburuk. kami menganggap "
        "kebenaran ini sudah jelas bahwa semua manusia diciptakan setara. "
        "dia berkata bahwa dia akan pulang ketika pekerjaan itu selesai. "
        "tidak ada yang baik atau buruk tetapi pikiranlah yang "
        "membuatnya begitu."
    ),
    "ca": (
        "la ràpida guineu marró salta per sobre del gos mandrós. van ser "
        "els millors temps i van ser els pitjors temps. considerem "
        "aquestes veritats evidents que tots els homes són creats iguals. "
        "ella va dir que tornaria a casa quan la feina estigués acabada. "
        "no hi ha res de bo ni de dolent però el pensament ho fa així."
    ),
    "ru": (
        "быстрая коричневая лиса перепрыгивает через ленивую собаку. это "
        "было лучшее из времен и это было худшее из времен. мы считаем "
        "эти истины самоочевидными что все люди созданы равными. она "
        "сказала что вернется домой когда работа будет закончена. нет "
        "ничего хорошего или плохого но мышление делает это таким."
    ),
    "el": (
        "η γρήγορη καφέ αλεπού πηδάει πάνω από το τεμπέλικο σκυλί. ήταν "
        "οι καλύτερες εποχές και ήταν οι χειρότερες εποχές. θεωρούμε "
        "αυτές τις αλήθειες αυτονόητες ότι όλοι οι άνθρωποι γεννιούνται "
        "ίσοι. είπε ότι θα γυρίσει σπίτι όταν τελειώσει η δουλειά. δεν "
        "υπάρχει τίποτα καλό ή κακό αλλά η σκέψη το κάνει έτσι."
    ),
}

LANGUAGES: List[str] = sorted(SEED_TEXTS)

# Held-out evaluation sentences — never used for profile building; the
# planted-truth fixture for the oracle-checked entry query and the
# accuracy tests (includes the confusable pairs es/pt, da/no, sv/da,
# cs/pl, es/ca).
HELDOUT_SENTENCES: Dict[str, List[str]] = {
    "en": [
        "yesterday the children walked through the forest and found a "
        "small river where they played until evening.",
        "the government announced new measures to improve public health "
        "and education across the country.",
    ],
    "es": [
        "ayer los niños caminaron por el bosque y encontraron un pequeño "
        "río donde jugaron hasta la noche.",
        "el gobierno anunció nuevas medidas para mejorar la salud pública "
        "y la educación en todo el país.",
    ],
    "pt": [
        "ontem as crianças caminharam pela floresta e encontraram um "
        "pequeno rio onde brincaram até à noite.",
        "o governo anunciou novas medidas para melhorar a saúde pública e "
        "a educação em todo o país.",
    ],
    "fr": [
        "hier les enfants ont marché dans la forêt et ont trouvé une "
        "petite rivière où ils ont joué jusqu'au soir.",
        "le gouvernement a annoncé de nouvelles mesures pour améliorer la "
        "santé publique et l'éducation dans tout le pays.",
    ],
    "de": [
        "gestern gingen die kinder durch den wald und fanden einen "
        "kleinen fluss wo sie bis zum abend spielten.",
        "die regierung kündigte neue maßnahmen an um die öffentliche "
        "gesundheit und bildung im ganzen land zu verbessern.",
    ],
    "it": [
        "ieri i bambini hanno camminato nel bosco e hanno trovato un "
        "piccolo fiume dove hanno giocato fino a sera.",
        "il governo ha annunciato nuove misure per migliorare la salute "
        "pubblica e l'istruzione in tutto il paese.",
    ],
    "nl": [
        "gisteren liepen de kinderen door het bos en vonden een kleine "
        "rivier waar ze tot de avond speelden.",
        "de regering kondigde nieuwe maatregelen aan om de "
        "volksgezondheid en het onderwijs in het hele land te verbeteren.",
    ],
    "sv": [
        "igår gick barnen genom skogen och hittade en liten flod där de "
        "lekte till kvällen.",
        "regeringen tillkännagav nya åtgärder för att förbättra "
        "folkhälsan och utbildningen i hela landet.",
    ],
    "da": [
        "i går gik børnene gennem skoven og fandt en lille flod hvor de "
        "legede indtil aftenen.",
        "regeringen annoncerede nye foranstaltninger for at forbedre "
        "folkesundheden og uddannelsen i hele landet.",
    ],
    "no": [
        "i går gikk barna gjennom skogen og fant en liten elv hvor de "
        "lekte til kvelden.",
        "regjeringen kunngjorde nye tiltak for å forbedre folkehelsen og "
        "utdanningen i hele landet.",
    ],
    "fi": [
        "eilen lapset kävelivät metsän läpi ja löysivät pienen joen jossa "
        "he leikkivät iltaan asti.",
        "hallitus ilmoitti uusista toimenpiteistä kansanterveyden ja "
        "koulutuksen parantamiseksi koko maassa.",
    ],
    "pl": [
        "wczoraj dzieci szły przez las i znalazły małą rzekę gdzie bawiły "
        "się do wieczora.",
        "rząd ogłosił nowe środki mające na celu poprawę zdrowia "
        "publicznego i edukacji w całym kraju.",
    ],
    "cs": [
        "včera děti šly lesem a našly malou řeku kde si hrály až do "
        "večera.",
        "vláda oznámila nová opatření ke zlepšení veřejného zdraví a "
        "vzdělávání v celé zemi.",
    ],
    "ro": [
        "ieri copiii au mers prin pădure și au găsit un râu mic unde s au "
        "jucat până seara.",
        "guvernul a anunțat noi măsuri pentru îmbunătățirea sănătății "
        "publice și a educației în toată țara.",
    ],
    "hu": [
        "tegnap a gyerekek átsétáltak az erdőn és találtak egy kis folyót "
        "ahol estig játszottak.",
        "a kormány új intézkedéseket jelentett be a közegészségügy és az "
        "oktatás javítására az egész országban.",
    ],
    "tr": [
        "dün çocuklar ormanda yürüdüler ve akşama kadar oynadıkları küçük "
        "bir nehir buldular.",
        "hükümet ülke genelinde halk sağlığını ve eğitimi iyileştirmek "
        "için yeni önlemler açıkladı.",
    ],
    "id": [
        "kemarin anak anak berjalan melewati hutan dan menemukan sungai "
        "kecil tempat mereka bermain sampai malam.",
        "pemerintah mengumumkan langkah langkah baru untuk meningkatkan "
        "kesehatan masyarakat dan pendidikan di seluruh negeri.",
    ],
    "ca": [
        "ahir els nens van caminar pel bosc i van trobar un petit riu on "
        "van jugar fins al vespre.",
        "el govern va anunciar noves mesures per millorar la salut "
        "pública i l'educació a tot el país.",
    ],
    "ru": [
        "вчера дети шли через лес и нашли маленькую реку где они играли "
        "до вечера.",
        "правительство объявило о новых мерах по улучшению общественного "
        "здравоохранения и образования по всей стране.",
    ],
    "el": [
        "χθες τα παιδιά περπάτησαν μέσα στο δάσος και βρήκαν ένα μικρό "
        "ποτάμι όπου έπαιξαν μέχρι το βράδυ.",
        "η κυβέρνηση ανακοίνωσε νέα μέτρα για τη βελτίωση της δημόσιας "
        "υγείας και της εκπαίδευσης σε όλη τη χώρα.",
    ],
}


def _normalize(text: str) -> str:
    """Lowercase; every non-alphabetic char becomes a space (digits and
    punctuation carry no language signal); runs collapse."""
    out = "".join(
        ch if ch.isalpha() else " " for ch in text.lower()[:MAX_CHARS]
    )
    return " ".join(out.split())


def _ngrams(text: str) -> Counter:
    """1-3-grams over space-padded words (classic Cavnar–Trenkle word
    padding: boundary grams like ' th' / 'he ' are strong features)."""
    grams: Counter = Counter()
    for word in _normalize(text).split():
        padded = f" {word} "
        ln = len(padded)
        for n in (1, 2, 3):
            for i in range(ln - n + 1):
                grams[padded[i : i + n]] += 1
    grams.pop(" ", None)
    return grams


def _rank(grams: Counter, depth: int) -> Dict[str, int]:
    """Rank grams by (count desc, gram asc) — the deterministic tie-break
    both the classifier and any replica must share."""
    ordered = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[:depth]
    return {g: i for i, (g, _) in enumerate(ordered)}


_PROFILES: Optional[Dict[str, Dict[str, int]]] = None


def profiles() -> Dict[str, Dict[str, int]]:
    global _PROFILES
    if _PROFILES is None:
        _PROFILES = {
            lang: _rank(_ngrams(seed), PROFILE_DEPTH)
            for lang, seed in SEED_TEXTS.items()
        }
    return _PROFILES


def classify(text: Optional[str]) -> str:
    """Classify one document; 'und' for empty/None input."""
    if not text:
        return "und"
    doc = _rank(_ngrams(text), DOC_DEPTH)
    if not doc:
        return "und"
    best_lang, best_dist = "und", None
    for lang in LANGUAGES:  # sorted: ties resolve to the smallest code
        prof = profiles()[lang]
        dist = 0
        for gram, doc_rank in doc.items():
            prof_rank = prof.get(gram)
            dist += (
                PROFILE_DEPTH
                if prof_rank is None
                else abs(doc_rank - prof_rank)
            )
        if best_dist is None or dist < best_dist:
            best_lang, best_dist = lang, dist
    # zero grams matched even the best profile (every term paid the
    # PROFILE_DEPTH out-of-profile penalty): unsupported script —
    # 'und', not the alphabetically first language.  A real match
    # contributes |doc_rank - prof_rank| < PROFILE_DEPTH, so the
    # criterion is exact.
    if best_dist is not None and best_dist >= len(doc) * PROFILE_DEPTH:
        return "und"
    return best_lang


# ---------------------------------------------------------------------
# Vectorized path.  Grams are packed into int64 keys, 21 bits per char,
# LEFT-aligned (char0 in the highest field, missing trailing chars = 0).
# Since every real gram char is >= U+0020 (space) and codepoints fit 21
# bits, keys never collide across lengths and their numeric order equals
# the gram's string order (prefix sorts first) — so (count desc, key asc)
# reproduces the scalar `_rank` tie-break bit-for-bit.
# ---------------------------------------------------------------------

_SP = 0x20

_VPROFILE = None  # (sorted_keys int64[G], ranks int32[G, L], langs)


def _pack(gram: str) -> int:
    k = 0
    for i, ch in enumerate(gram):
        k |= ord(ch) << (42 - 21 * i)
    return k


def _vprofile():
    global _VPROFILE
    if _VPROFILE is None:
        import numpy as np

        profs = profiles()
        langs = sorted(profs)
        key_set = sorted({_pack(g) for p in profs.values() for g in p})
        index = {k: i for i, k in enumerate(key_set)}
        ranks = np.full((len(key_set), len(langs)), -1, dtype=np.int32)
        for li, lang in enumerate(langs):
            for gram, rank in profs[lang].items():
                ranks[index[_pack(gram)], li] = rank
        _VPROFILE = (
            np.asarray(key_set, dtype=np.int64),
            ranks,
            langs,
        )
    return _VPROFILE


_ALPHA_TABLE = None  # bool[0x10000]: chr(c).isalpha() for the BMP


def _alpha_table():
    global _ALPHA_TABLE
    if _ALPHA_TABLE is None:
        import numpy as np

        _ALPHA_TABLE = np.frombuffer(
            bytes(chr(c).isalpha() for c in range(0x10000)), dtype=np.bool_
        )
    return _ALPHA_TABLE


def _joined_codepoints(text: str):
    """``_normalize`` + double-space word join, computed numerically:
    codepoint array with words separated by two spaces and padded by one
    space each side — identical to
    ``" " + _normalize(text).replace(" ", "  ") + " "``."""
    import numpy as np

    cp = np.frombuffer(
        text.lower()[:MAX_CHARS].encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    if cp.size == 0:
        return None
    table = _alpha_table()
    high = cp >= 0x10000
    is_a = table[np.where(high, 0, cp)]
    if high.any():  # astral letters exist (Gothic, CJK ext): exact check
        idx = np.nonzero(high)[0]
        is_a[idx] = [chr(int(c)).isalpha() for c in cp[idx]]
    n_alpha = int(is_a.sum())
    if n_alpha == 0:
        return None
    prev = np.concatenate(([False], is_a[:-1]))
    word_id = np.cumsum(is_a & ~prev)[is_a] - 1
    out = np.full(n_alpha + 2 * int(word_id[-1]) + 2, _SP, dtype=np.int64)
    out[1 + np.arange(n_alpha) + 2 * word_id] = cp[is_a]
    return out


def _doc_keys_np(text: str):
    """Packed keys + out-of-place ranks for a document's top-M grams.

    The per-word padding of the scalar `_ngrams` is reproduced with a
    double-space join: grams never span two words, and the only spurious
    grams the join introduces contain adjacent double spaces — masked
    out below.  Returns (keys, ranks) or None for gram-less input.
    """
    import numpy as np

    arr = _joined_codepoints(text)
    if arr is None:
        return None
    k1 = arr[arr != _SP] << 42
    a, b = arr[:-1], arr[1:]
    m2 = ~((a == _SP) & (b == _SP))
    k2 = (a[m2] << 42) | (b[m2] << 21)
    a, b, c = arr[:-2], arr[1:-1], arr[2:]
    m3 = ~(((a == _SP) & (b == _SP)) | ((b == _SP) & (c == _SP)))
    k3 = (a[m3] << 42) | (b[m3] << 21) | c[m3]
    keys = np.concatenate([k1, k2, k3])
    if keys.size == 0:
        return None
    uniq, counts = np.unique(keys, return_counts=True)
    top = np.lexsort((uniq, -counts))[:DOC_DEPTH]
    return uniq[top], np.arange(len(top), dtype=np.int64)


def classify_np(text: Optional[str]) -> str:
    """Vectorized classifier — bit-identical to ``classify``."""
    import numpy as np

    if not text:
        return "und"
    doc = _doc_keys_np(text)
    if doc is None:
        return "und"
    doc_keys, doc_ranks = doc
    pkeys, ranks, langs = _vprofile()
    pos = np.searchsorted(pkeys, doc_keys)
    pos_c = np.minimum(pos, len(pkeys) - 1)
    found = pkeys[pos_c] == doc_keys
    sub = ranks[pos_c[found]]  # [F, L]
    dr = doc_ranks[found][:, None]
    dist = np.where(sub >= 0, np.abs(sub - dr), PROFILE_DEPTH).sum(axis=0)
    dist = dist + int(len(doc_keys) - found.sum()) * PROFILE_DEPTH
    best = int(np.argmin(dist))
    # same unsupported-script guard as the scalar path: all grams
    # out-of-profile for the best language -> 'und'
    if int(dist[best]) >= len(doc_keys) * PROFILE_DEPTH:
        return "und"
    return langs[best]


def language_id_ct(col: Column) -> Column:
    """Arrow-batched Cavnar–Trenkle language ID over a string column."""

    @F.pandas_udf("string")
    def _classify_batch(texts: pd.Series) -> pd.Series:
        _vprofile()  # build once per worker, outside the row loop
        return texts.map(classify_np)

    return _classify_batch(col)
