"""Static resource sets used by the sentence splitter, URL detector and
tokenizer.

The lists are DATA extracted from the reference's public resource XMLs
([resources]/tokenizing/sent-splitter-resources.xml and
url-detector-resources.xml, loaded by SentSplitterModel.cs:112-156 and
UrlDetector.cs:101-129) — only the subsets the Simple predict path consults.
The digit unit suffixes mirror Tokenizer.cs:211-219.

Everything here is read-only and process-wide; worker processes build the
frozensets once at import (cheap), so stateless Ray tasks can use them
without an actor.
"""
from __future__ import annotations

# Tokenizer.cs:211-219 (_DigitsSpecEnds, InvariantCultureIgnoreCase) — stored
# upper-invariant; compare with xlat.upper_invariant(...)
DIGITS_SPEC_ENDS = frozenset(
    {
        "Г", "Г.",
        "КГ", "КГ.",
        "СМ", "СМ.",
        "КМ", "КМ.",
        "ТЫС", "ТЫС.",
        "МЛН", "МЛН.",
    }
)

# sent-splitter-resources.xml <streets-ends-as-separate-words> /
# <streets-ends-as-end-of-complex-words>; consulted by the Simple splitter
# via TryGetStreetsEnds (SentSplitter.cs:2422-2443). Stored upper-invariant.
STREETS_ENDS_SEPARATE = frozenset({"ALLEE.", "STR.", "PLATZ."})
STREETS_ENDS_COMPLEX_SUFFIX = ("-ALLEE.", "-STR.", "-PLATZ.")

# url-detector-resources.xml <first-level-domains> (269 entries incl.
# cyrillic TLDs), compared upper-invariant (UrlDetector.cs:118-123).
FIRST_LEVEL_DOMAINS = frozenset(
    s.upper()
    for s in (
        "ac ad ae aero af ag ai al am an ao aq ar as asia at au aw az ba bb bd be bf bg"
        " bh bi biz bj bm bn bo br bs bt bv bw by bz ca cat cc cd cf cg ch ci ck cl cm cn"
        " co com coop cr cu cv cx cy cz de dj dk dm do dz ec edu ee eg eh er es et eu fi"
        " fj fk fm fo fr ga gb gd ge gf gg gh gi gl gm gn gov gp gq gr gs gt gu gw gy hk"
        " hm hn hr ht hu ie il im in info int io iq ir is it je jm jo jobs jp ke kg kh ki"
        " km kn kp kr kw ky kz la lb lc li lk lr ls lt lu lv ly ma mc md mg mh mil mk ml"
        " mm mn mo mobi mp mq mr ms mt mu museum mv mw mx my mz na name nato nc ne net nf"
        " ng ni nl no np nu nz om org pa pe pf pg ph pk pl pm pn pr pro ps pt pw py qa re"
        " ro ru rw sa sb sc sd se sg sh si sj sk sl sm sn so sr su sv sy sz tc td tel tf"
        " tg th tj tk tm tn to tp tr travel tt tv tw tz ua ug uk um us uy uz va vc ve vg"
        " vi vn vu wf ws ye yt yu za zm zw ком нет орг ру рф"
    ).split()
)
FIRST_LEVEL_DOMAINS_MAX_LEN = max(len(s) for s in FIRST_LEVEL_DOMAINS)

# url-detector-resources.xml <uri-schemes>, compared upper-invariant.
URI_SCHEMES = frozenset(
    s.upper()
    for s in (
        "acap adiumxtra attachment bitcoin chrome chrome-extension"
        " com-eventbrite-attendee cvs dns ed2k facetime file finger fish ftp"
        " gizmoproject gopher http https iax imap irc irc6 ircs jabber jar javascript"
        " jdbc ldap magnet mailto mms ms-help ms-settings-power nntp rtmp rtsp sftp"
        " skype snews snmp ssh telnet tftp udp urn uuid ws wss xmpp"
    ).split()
)
URI_SCHEMES_MAX_LEN = max(len(s) for s in URI_SCHEMES)

NUM_PLACEHOLDER = "[%NUM%]"  # Tokenizer.cs:197
URL_PLACEHOLDER = "[%URL%]"  # Tokenizer.cs:198
