"""Embedded seed text per language.

fastText / KenLM artifacts are not available in this environment, so both
models are built from scratch at import time from this embedded corpus
(original sentences written for this project — no external data). The
corpus doubles as the template pool for the synthetic caption generator,
which is what makes the langid / perplexity scores well-separated on the
test corpus: clean captions are drawn from the same distribution the
models were fit on, defects are not.
"""

from __future__ import annotations

SEED_TEXT: dict[str, list[str]] = {
    "en": [
        "a brown dog runs across the green field near the old wooden fence",
        "two children are playing with a red ball on the sandy beach at sunset",
        "the city skyline glows under a clear evening sky with scattered clouds",
        "a woman in a blue coat walks her bicycle along the cobblestone street",
        "fresh bread and pastries are displayed in the window of a small bakery",
        "the mountain lake reflects the snowy peaks and the tall pine trees",
        "an old man reads a newspaper on a bench in the quiet morning park",
        "a group of students studies together at a long table in the library",
        "the fishing boat returns to the harbor as seagulls circle overhead",
        "a cat sleeps curled up on the warm windowsill in the afternoon sun",
        "workers repair the railway tracks while traffic waits at the crossing",
        "the chef garnishes a plate of pasta with fresh basil and olive oil",
        "autumn leaves cover the path through the forest behind the farmhouse",
        "a young photographer captures the street performers in the main square",
        "rain falls softly on the tin roof of the cabin by the river bend",
    ],
    "de": [
        "ein brauner hund läuft über die grüne wiese neben dem alten holzzaun",
        "zwei kinder spielen mit einem roten ball am sandigen strand bei sonnenuntergang",
        "die skyline der stadt leuchtet unter einem klaren abendhimmel mit wolken",
        "eine frau im blauen mantel schiebt ihr fahrrad über die kopfsteinpflasterstraße",
        "frisches brot und gebäck liegen im schaufenster einer kleinen bäckerei",
        "der bergsee spiegelt die schneebedeckten gipfel und die hohen kiefern",
        "ein alter mann liest die zeitung auf einer bank im ruhigen morgenpark",
        "eine gruppe von studenten lernt gemeinsam an einem langen tisch in der bibliothek",
        "das fischerboot kehrt in den hafen zurück während möwen darüber kreisen",
        "eine katze schläft zusammengerollt auf der warmen fensterbank in der sonne",
        "arbeiter reparieren die gleise während der verkehr am übergang wartet",
        "der koch garniert einen teller nudeln mit frischem basilikum und olivenöl",
        "herbstblätter bedecken den weg durch den wald hinter dem bauernhaus",
        "ein junger fotograf fotografiert die straßenkünstler auf dem hauptplatz",
        "regen fällt leise auf das blechdach der hütte an der flussbiegung",
    ],
    "fr": [
        "un chien brun court à travers le champ vert près de la vieille clôture en bois",
        "deux enfants jouent avec un ballon rouge sur la plage de sable au coucher du soleil",
        "les toits de la ville brillent sous un ciel clair du soir avec quelques nuages",
        "une femme en manteau bleu pousse son vélo le long de la rue pavée",
        "du pain frais et des pâtisseries sont exposés dans la vitrine d'une petite boulangerie",
        "le lac de montagne reflète les sommets enneigés et les grands pins",
        "un vieil homme lit le journal sur un banc dans le parc calme du matin",
        "un groupe d'étudiants travaille ensemble à une longue table de la bibliothèque",
        "le bateau de pêche rentre au port tandis que les mouettes tournent au dessus",
        "un chat dort roulé en boule sur le rebord chaud de la fenêtre au soleil",
        "des ouvriers réparent les voies ferrées pendant que la circulation attend",
        "le chef garnit une assiette de pâtes avec du basilic frais et de l'huile d'olive",
        "les feuilles d'automne couvrent le sentier qui traverse la forêt derrière la ferme",
        "un jeune photographe photographie les artistes de rue sur la place principale",
        "la pluie tombe doucement sur le toit de la cabane près du méandre de la rivière",
    ],
    "es": [
        "un perro marrón corre por el campo verde cerca de la vieja cerca de madera",
        "dos niños juegan con una pelota roja en la playa de arena al atardecer",
        "el horizonte de la ciudad brilla bajo un cielo despejado con algunas nubes",
        "una mujer con abrigo azul empuja su bicicleta por la calle adoquinada",
        "pan fresco y pasteles se exhiben en el escaparate de una pequeña panadería",
        "el lago de montaña refleja los picos nevados y los altos pinos",
        "un anciano lee el periódico en un banco del parque tranquilo por la mañana",
        "un grupo de estudiantes estudia junto en una mesa larga de la biblioteca",
        "el barco pesquero regresa al puerto mientras las gaviotas vuelan en círculos",
        "un gato duerme acurrucado en el alféizar cálido de la ventana al sol",
        "los trabajadores reparan las vías del tren mientras el tráfico espera en el cruce",
        "el cocinero adorna un plato de pasta con albahaca fresca y aceite de oliva",
        "las hojas de otoño cubren el sendero que atraviesa el bosque detrás de la granja",
        "un joven fotógrafo fotografía a los artistas callejeros en la plaza principal",
        "la lluvia cae suavemente sobre el techo de la cabaña junto al recodo del río",
    ],
    "it": [
        "un cane marrone corre attraverso il campo verde vicino alla vecchia recinzione di legno",
        "due bambini giocano con una palla rossa sulla spiaggia sabbiosa al tramonto",
        "lo skyline della città brilla sotto un cielo serale limpido con poche nuvole",
        "una donna con un cappotto blu spinge la bicicletta lungo la strada di ciottoli",
        "pane fresco e dolci sono esposti nella vetrina di una piccola panetteria",
        "il lago di montagna riflette le cime innevate e gli alti pini",
        "un vecchio legge il giornale su una panchina nel parco tranquillo del mattino",
        "un gruppo di studenti studia insieme a un lungo tavolo della biblioteca",
        "il peschereccio torna al porto mentre i gabbiani volteggiano sopra",
        "un gatto dorme raggomitolato sul davanzale caldo della finestra al sole",
        "gli operai riparano i binari mentre il traffico aspetta al passaggio a livello",
        "lo chef guarnisce un piatto di pasta con basilico fresco e olio d'oliva",
        "le foglie d'autunno coprono il sentiero che attraversa il bosco dietro la fattoria",
        "un giovane fotografo fotografa gli artisti di strada nella piazza principale",
        "la pioggia cade dolcemente sul tetto della capanna vicino all'ansa del fiume",
    ],
    "pt": [
        "um cão castanho corre pelo campo verde perto da velha cerca de madeira",
        "duas crianças brincam com uma bola vermelha na praia de areia ao pôr do sol",
        "o horizonte da cidade brilha sob um céu limpo de fim de tarde com poucas nuvens",
        "uma mulher de casaco azul empurra a bicicleta pela rua de paralelepípedos",
        "pão fresco e doces estão expostos na vitrine de uma pequena padaria",
        "o lago da montanha reflete os picos nevados e os altos pinheiros",
        "um velho lê o jornal num banco do parque tranquilo pela manhã",
        "um grupo de estudantes estuda junto numa mesa comprida da biblioteca",
        "o barco de pesca regressa ao porto enquanto as gaivotas voam em círculos",
        "um gato dorme enrolado no parapeito quente da janela ao sol",
        "os trabalhadores reparam os trilhos enquanto o trânsito espera na passagem",
        "o cozinheiro decora um prato de massa com manjericão fresco e azeite",
        "as folhas de outono cobrem o caminho pela floresta atrás da quinta",
        "um jovem fotógrafo fotografa os artistas de rua na praça principal",
        "a chuva cai suavemente sobre o telhado da cabana perto da curva do rio",
    ],
}

LANGS: tuple[str, ...] = tuple(sorted(SEED_TEXT))

# Small per-language stopword lists for the stopword-density rule.
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the a an and or of in on at to with for from by is are was were be this that it as".split()
    ),
    "de": frozenset(
        "der die das ein eine und oder von in auf an zu mit für aus bei ist sind war waren es als dem den".split()
    ),
    "fr": frozenset(
        "le la les un une des et ou de du dans sur à avec pour par est sont était ce cette il elle que au aux".split()
    ),
    "es": frozenset(
        "el la los las un una y o de del en sobre a con para por es son era este esta que al lo".split()
    ),
    "it": frozenset(
        "il lo la i gli le un una e o di del in su a con per da è sono era questo questa che al nel".split()
    ),
    "pt": frozenset(
        "o a os as um uma e ou de do da em sobre com para por é são era este esta que ao no na".split()
    ),
}
