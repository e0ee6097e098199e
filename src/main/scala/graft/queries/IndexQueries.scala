package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Urls
import graft.operators.{Bpe, Dedup, LanguageModel, Search, Similarity, Sketch}

/** q100–q105: corpus indexing, language-model scoring, and
  * membership/cardinality sketches — retrieval and statistics
  * operators a training-data pipeline layers over the cleaned corpus.
  *
  * Everything is oracle-gated with integer-exact arithmetic: LM
  * conditional probabilities ride as integer parts-per-million, the
  * Bloom bitmap packs 63 bits/word so no engine touches the BIGINT
  * sign bit, and HLL ranks derive from binary-string length — float
  * paths (BM25, the HLL harmonic-mean readout) are spec-gated on
  * planted fixtures instead.
  */
object IndexQueries extends QueryPack {

  /** DuckDB rendition of TextAnalysis.tokens (same guard as
    * LlmQueries: empty text ⇒ empty list, not ['']).
    */
  private[queries] val toksCte =
    """t AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS toks
      |  FROM documents)""".stripMargin

  /** token-frequency CTE (token, doc_id, tf) shared by the index and
    * search oracles.
    */
  private[queries] val tfCte =
    s"""$toksCte,
      |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
      |tf AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)""".stripMargin

  /** One BPE training round as CTE stages (pair counts → total-order
    * argmax → merge replace) — shared by the q107 (train) and q110
    * (encode) oracles so both replay the identical iteration.
    * The merge is a LEFT JOIN with a null-guard no-op: when a round
    * has no remaining adjacent pair (all-single-symbol vocabulary),
    * b$n is empty and the round must keep the vocabulary unchanged —
    * matching Bpe.train's early-stop semantics (a CROSS JOIN would
    * drop every word).
    */
  private[queries] def bpeStage(n: Int): String = {
    val prev = s"w${n - 1}"
    s"""p$n AS (
      |  SELECT syms[i] AS l, syms[i + 1] AS r,
      |         CAST(sum(cnt) AS BIGINT) AS pc
      |  FROM (SELECT cnt, syms,
      |          unnest(generate_series(1, len(syms) - 1)) AS i
      |        FROM (SELECT cnt,
      |                string_split_regex(trim(sym), '\\s+') AS syms
      |              FROM $prev)
      |        WHERE len(syms) >= 2)
      |  GROUP BY 1, 2),
      |b$n AS (SELECT l, r FROM p$n ORDER BY pc DESC, l, r LIMIT 1),
      |w$n AS (
      |  SELECT word, cnt,
      |    CASE WHEN l IS NULL THEN sym
      |         ELSE replace(sym, ' ' || l || '  ' || r || ' ',
      |                      ' ' || l || r || ' ') END AS sym
      |  FROM $prev LEFT JOIN b$n ON TRUE)""".stripMargin
  }

  /** lower-cased token vocabulary + initial symbolization (w0) — the
    * head of both BPE oracles.
    */
  private[queries] val bpeHeadCte =
    """tok AS (
      |  SELECT unnest(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
      |                ELSE string_split_regex(trim(lower(text)), '\s+') END) AS word
      |  FROM documents),
      |w0 AS (
      |  SELECT word, count(*) AS cnt,
      |    ' ' || regexp_replace(word, '(.)', '\1  ', 'g') AS sym
      |  FROM tok GROUP BY word)""".stripMargin

  /** q120 expected (doc_id, deflate-ratio) rows over the sf0.01
    * fixture — authoring-time computation, see the q120 comment.
    *
    * ZLIB-IDENTITY ASSUMPTION (r14 ADVICE): these values were
    * produced by CPython zlib (compressobj(1, DEFLATED, -15)) and
    * assume the JVM's Deflater(BEST_SPEED, nowrap) emits
    * byte-identical streams — true for stock madler zlib (what both
    * runtimes bundle), NOT guaranteed under zlib-ng-backed builds.
    * DeflateRatioSpec's "local zlib is byte-identical" pin compresses
    * a known string through the exact q120 path and fails loudly
    * (naming this gate) when the local zlib diverges.
    */
  private val q120ExpectedValues: String =
    """(0, 0.5923566878980892e0), (1, 0.43596059113300495e0), (2, 0.524390243902439e0),
(3, 0.6326530612244898e0), (4, 0.536e0), (5, 0.5031847133757962e0),
(6, 0.7435897435897436e0), (7, 0.4527363184079602e0), (8, 0.42127659574468085e0),
(9, 0.46035805626598464e0), (10, 0.5607476635514018e0), (11, 0.4901315789473684e0),
(12, 0.47413793103448276e0), (13, 0.47109826589595377e0), (14, 0.41414141414141414e0),
(15, 0.543859649122807e0), (16, 0.7666666666666667e0), (17, 0.44835680751173707e0),
(18, 0.4491725768321513e0), (19, 0.9122807017543859e0), (20, 0.4543147208121827e0),
(21, 0.5253456221198156e0), (22, 0.44052863436123346e0), (23, 0.6265060240963856e0),
(24, 0.4e0), (25, 0.42178217821782177e0), (26, 0.873015873015873e0),
(27, 0.48265895953757226e0), (28, 0.4880239520958084e0), (29, 0.5612244897959183e0),
(30, 0.6287425149700598e0), (31, 0.524e0), (32, 0.42300194931773877e0),
(33, 0.5182186234817814e0), (34, 0.6363636363636364e0), (35, 0.42920353982300885e0),
(36, 0.6074074074074074e0), (37, 0.4497354497354497e0), (38, 0.5467980295566502e0),
(39, 0.6774193548387096e0), (40, 0.43942992874109266e0), (41, 0.47477744807121663e0),
(42, 0.4884488448844885e0), (43, 0.6578947368421053e0), (44, 0.640625e0),
(45, 0.44675925925925924e0), (46, 0.4024390243902439e0), (47, 0.5669642857142857e0),
(48, 0.6036585365853658e0), (49, 0.5078125e0), (50, 0.50390625e0),
(51, 0.49693251533742333e0), (52, 0.8888888888888888e0), (53, 0.5684210526315789e0),
(54, 0.47058823529411764e0), (55, 0.5408163265306123e0), (56, 0.4098360655737705e0),
(57, 0.44742729306487694e0), (58, 0.4524421593830334e0), (59, 0.6694915254237288e0),
(60, 0.43610547667342797e0), (61, 0.47896440129449835e0), (62, 0.45918367346938777e0),
(63, 0.4120982986767486e0), (64, 0.6370370370370371e0), (65, 0.7070707070707071e0),
(66, 0.4715909090909091e0), (67, 0.48348348348348347e0), (68, 0.5645161290322581e0),
(69, 0.4902597402597403e0), (70, 0.4302554027504912e0), (71, 0.47619047619047616e0),
(72, 0.5521739130434783e0), (73, 0.4254473161033797e0), (74, 0.7916666666666666e0),
(75, 0.49038461538461536e0), (76, 0.45287958115183247e0), (77, 0.4952978056426332e0),
(78, 0.5536480686695279e0), (79, 0.873015873015873e0), (80, 0.6046511627906976e0),
(81, 0.4789915966386555e0), (82, 0.5269230769230769e0), (83, 0.7727272727272727e0),
(84, 0.4441687344913151e0), (85, 0.6193548387096774e0), (86, 0.644927536231884e0),
(87, 0.6796875e0), (88, 0.4913494809688581e0), (89, 0.6028368794326241e0),
(90, 0.7232142857142857e0), (91, 0.4431554524361949e0), (92, 0.6438356164383562e0),
(93, 0.6230769230769231e0), (94, 0.6013986013986014e0), (95, 0.49324324324324326e0),
(96, 0.4118942731277533e0), (97, 0.484375e0), (98, 0.41254752851711024e0),
(99, 0.5867346938775511e0), (100, 0.44685466377440347e0), (101, 0.5387931034482759e0),
(102, 0.39611650485436894e0), (103, 0.4098671726755218e0), (104, 0.516260162601626e0),
(105, 0.4878048780487805e0), (106, 0.8714285714285714e0), (107, 0.5707547169811321e0),
(108, 0.7093023255813954e0), (109, 0.4531645569620253e0), (110, 0.9074074074074074e0),
(111, 0.4158790170132325e0), (112, 0.4813664596273292e0), (113, 0.4439252336448598e0),
(114, 0.5410628019323671e0), (115, 0.6818181818181818e0), (116, 0.8548387096774194e0),
(117, 0.516260162601626e0), (118, 0.45454545454545453e0), (119, 0.8160919540229885e0),
(120, 0.5450236966824644e0), (121, 0.6369047619047619e0), (122, 0.7352941176470589e0),
(123, 0.5886075949367089e0), (124, 0.4887459807073955e0), (125, 0.5891891891891892e0),
(126, 0.4066797642436149e0), (127, 0.44930875576036866e0), (128, 0.42857142857142855e0),
(129, 0.428246013667426e0), (130, 0.6333333333333333e0), (131, 0.515358361774744e0),
(132, 0.49696969696969695e0), (133, 0.426e0), (134, 0.6742424242424242e0),
(135, 0.41821561338289964e0), (136, 0.46706586826347307e0), (137, 0.5407725321888412e0),
(138, 0.4725274725274725e0), (139, 0.4897959183673469e0), (140, 0.6369426751592356e0),
(141, 0.4236111111111111e0), (142, 0.435546875e0), (143, 0.43795620437956206e0),
(144, 0.7865168539325843e0), (145, 0.4513715710723192e0), (146, 0.6511627906976745e0),
(147, 0.45475113122171945e0), (148, 0.5279187817258884e0), (149, 0.6114649681528662e0),
(150, 0.5036496350364964e0), (151, 0.42196531791907516e0), (152, 0.5412844036697247e0),
(153, 0.44110854503464203e0), (154, 0.4492099322799097e0), (155, 0.4713896457765668e0),
(156, 0.680327868852459e0), (157, 0.7582417582417582e0), (158, 0.6792452830188679e0),
(159, 0.47229551451187335e0), (160, 0.5040650406504065e0), (161, 0.4249471458773784e0),
(162, 0.4410480349344978e0), (163, 0.5175097276264592e0), (164, 0.7222222222222222e0),
(165, 0.7314814814814815e0), (166, 0.4831804281345566e0), (167, 0.4357894736842105e0),
(168, 0.5263157894736842e0), (169, 0.4321608040201005e0), (170, 0.6612903225806451e0),
(171, 0.49390243902439024e0), (172, 0.7184466019417476e0), (173, 0.4185185185185185e0),
(174, 0.49206349206349204e0), (175, 0.6139240506329114e0), (176, 0.4195519348268839e0),
(177, 0.5437262357414449e0), (178, 0.5373831775700935e0), (179, 0.4194214876033058e0),
(180, 0.6108108108108108e0), (181, 0.7155963302752294e0), (182, 0.4897959183673469e0),
(183, 0.7676767676767676e0), (184, 0.45351473922902497e0), (185, 0.4786885245901639e0),
(186, 0.4406779661016949e0), (187, 0.42052313883299797e0), (188, 0.540650406504065e0),
(189, 0.5603864734299517e0), (190, 0.4485981308411215e0), (191, 0.6949152542372882e0),
(192, 0.6363636363636364e0), (193, 0.625e0), (194, 0.6474358974358975e0),
(195, 0.4968553459119497e0), (196, 0.4778761061946903e0), (197, 0.41379310344827586e0),
(198, 0.5118110236220472e0), (199, 0.6363636363636364e0), (200, 0.4884488448844885e0),
(201, 0.5111111111111111e0), (202, 0.41995841995842e0), (203, 0.65625e0),
(204, 0.6666666666666666e0), (205, 0.47074468085106386e0), (206, 0.6307692307692307e0),
(207, 0.4675324675324675e0), (208, 0.6608695652173913e0), (209, 0.5426008968609866e0),
(210, 0.42135922330097086e0), (211, 0.5089605734767025e0), (212, 0.515748031496063e0),
(213, 0.43897216274089934e0), (214, 0.8405797101449275e0), (215, 0.41935483870967744e0),
(216, 0.42344045368620037e0), (217, 0.47714285714285715e0), (218, 0.4351648351648352e0),
(219, 0.5428571428571428e0), (220, 0.41229656419529837e0), (221, 0.579185520361991e0),
(222, 0.5172413793103449e0), (223, 0.4335511982570806e0), (224, 0.43665158371040724e0),
(225, 0.4486873508353222e0), (226, 0.7155963302752294e0), (227, 0.42948717948717946e0),
(228, 0.4353448275862069e0), (229, 0.44254278728606355e0), (230, 0.4855305466237942e0),
(231, 0.6193548387096774e0), (232, 0.4936708860759494e0), (233, 0.4410480349344978e0),
(234, 0.47674418604651164e0), (235, 0.5535714285714286e0), (236, 0.8709677419354839e0),
(237, 0.43990384615384615e0), (238, 0.5214007782101168e0), (239, 0.6036585365853658e0),
(240, 0.4710526315789474e0), (241, 0.41682974559686886e0), (242, 0.4690721649484536e0),
(243, 0.5898876404494382e0), (244, 0.4609164420485175e0), (245, 0.4206008583690987e0),
(246, 0.5885714285714285e0), (247, 0.4372093023255814e0), (248, 0.44170403587443946e0),
(249, 0.45707656612529e0), (250, 0.5303643724696356e0), (251, 0.42829827915869984e0),
(252, 0.5317460317460317e0), (253, 0.5685279187817259e0), (254, 0.6893203883495146e0),
(255, 0.5732484076433121e0), (256, 0.8709677419354839e0), (257, 0.6929824561403509e0),
(258, 0.46464646464646464e0), (259, 0.4980694980694981e0), (260, 0.6268656716417911e0),
(261, 0.4300847457627119e0), (262, 0.5078125e0), (263, 0.4451901565995526e0),
(264, 0.4209558823529412e0), (265, 0.5074626865671642e0), (266, 0.5511111111111111e0),
(267, 0.44339622641509435e0), (268, 0.5416666666666666e0), (269, 0.4346895074946467e0),
(270, 0.43286573146292584e0), (271, 0.5084745762711864e0), (272, 0.4444444444444444e0),
(273, 0.6242038216560509e0), (274, 0.4208566108007449e0), (275, 0.8775510204081632e0),
(276, 0.4163568773234201e0), (277, 0.5766871165644172e0), (278, 0.44923857868020306e0),
(279, 0.5124555160142349e0), (280, 0.44468085106382976e0), (281, 0.5730994152046783e0),
(282, 0.5898876404494382e0), (283, 0.42038216560509556e0), (284, 0.5179856115107914e0),
(285, 0.43359375e0), (286, 0.5193798449612403e0), (287, 0.7128712871287128e0),
(288, 0.5909090909090909e0), (289, 0.5e0), (290, 0.41320754716981134e0),
(291, 0.45083932853717024e0), (292, 0.42139737991266374e0), (293, 0.45194805194805193e0),
(294, 0.4425531914893617e0), (295, 0.5860215053763441e0), (296, 0.46518105849582175e0),
(297, 0.4937888198757764e0), (298, 0.5873015873015873e0), (299, 0.4402390438247012e0),
(300, 0.5509259259259259e0), (301, 0.4311023622047244e0), (302, 0.42768595041322316e0),
(303, 0.44273127753303965e0), (304, 0.5570776255707762e0), (305, 0.7936507936507936e0),
(306, 0.4489311163895487e0), (307, 0.5099337748344371e0), (308, 0.7731958762886598e0),
(309, 0.542016806722689e0), (310, 0.6013513513513513e0), (311, 0.4404040404040404e0),
(312, 0.45528455284552843e0), (313, 0.7126436781609196e0), (314, 0.6210526315789474e0),
(315, 0.4391304347826087e0), (316, 0.4520884520884521e0), (317, 0.44362745098039214e0),
(318, 0.43201754385964913e0), (319, 0.40545808966861596e0), (320, 0.454320987654321e0),
(321, 0.5e0), (322, 0.5215686274509804e0), (323, 0.48338368580060426e0),
(324, 0.5482456140350878e0), (325, 0.49390243902439024e0), (326, 0.5757575757575758e0),
(327, 0.580110497237569e0), (328, 0.43232323232323233e0), (329, 0.46742209631728043e0),
(330, 0.5031645569620253e0), (331, 0.49e0), (332, 0.5458937198067633e0),
(333, 0.6214689265536724e0), (334, 0.4318181818181818e0), (335, 0.4707692307692308e0),
(336, 0.4787234042553192e0), (337, 0.5413223140495868e0), (338, 0.7582417582417582e0),
(339, 0.5721925133689839e0), (340, 0.5344129554655871e0), (341, 0.4519906323185012e0),
(342, 0.6551724137931034e0), (343, 0.5935483870967742e0), (344, 0.460431654676259e0),
(345, 0.4953560371517028e0), (346, 0.4547677261613692e0), (347, 0.49645390070921985e0),
(348, 0.6717557251908397e0), (349, 0.4310722100656455e0), (350, 0.4282655246252677e0),
(351, 0.4673913043478261e0), (352, 0.4197761194029851e0), (353, 0.4984126984126984e0),
(354, 0.4507042253521127e0), (355, 0.43626062322946174e0), (356, 0.467966573816156e0),
(357, 0.525691699604743e0), (358, 0.864406779661017e0), (359, 0.47560975609756095e0),
(360, 0.43792325056433407e0), (361, 0.46831955922865015e0), (362, 0.8148148148148148e0),
(363, 0.4649859943977591e0), (364, 0.5148148148148148e0), (365, 0.8805970149253731e0),
(366, 0.4790996784565916e0), (367, 0.568075117370892e0), (368, 0.7397260273972602e0),
(369, 0.5238095238095238e0), (370, 0.491869918699187e0), (371, 0.48e0),
(372, 0.6690140845070423e0), (373, 0.4690721649484536e0), (374, 0.5824175824175825e0),
(375, 0.46647230320699706e0), (376, 0.45776566757493187e0), (377, 0.5512820512820513e0),
(378, 0.49258160237388726e0), (379, 0.4466501240694789e0), (380, 0.4492099322799097e0),
(381, 0.45609065155807366e0), (382, 0.6666666666666666e0), (383, 0.5236220472440944e0),
(384, 0.782608695652174e0), (385, 0.44862155388471175e0), (386, 0.4416135881104034e0),
(387, 0.5721153846153846e0), (388, 0.463768115942029e0), (389, 0.6118421052631579e0),
(390, 0.6277372262773723e0), (391, 0.5546218487394958e0), (392, 0.6518518518518519e0),
(393, 0.4258064516129032e0), (394, 0.4430693069306931e0), (395, 0.4091858037578288e0),
(396, 0.532258064516129e0), (397, 0.47959183673469385e0), (398, 0.7333333333333333e0),
(399, 0.49514563106796117e0), (400, 0.6791044776119403e0), (401, 0.4315068493150685e0),
(402, 0.63125e0), (403, 0.4397463002114165e0), (404, 0.5656108597285068e0),
(405, 0.49044585987261147e0), (406, 0.4282608695652174e0), (407, 0.6944444444444444e0),
(408, 0.7471264367816092e0), (409, 0.5164835164835165e0), (410, 0.4552058111380145e0),
(411, 0.46958637469586373e0), (412, 0.4821917808219178e0), (413, 0.4439252336448598e0),
(414, 0.4534313725490196e0), (415, 0.4984025559105431e0), (416, 0.5121951219512195e0),
(417, 0.41923076923076924e0), (418, 0.428246013667426e0), (419, 0.7456140350877193e0),
(420, 0.42516268980477223e0), (421, 0.4282608695652174e0), (422, 0.4684931506849315e0),
(423, 0.4738292011019284e0), (424, 0.44254278728606355e0), (425, 0.6641221374045801e0),
(426, 0.4491150442477876e0), (427, 0.4380952380952381e0), (428, 0.5268817204301075e0),
(429, 0.4208566108007449e0), (430, 0.46365914786967416e0), (431, 0.50814332247557e0),
(432, 0.479108635097493e0), (433, 0.6136363636363636e0), (434, 0.45390070921985815e0),
(435, 0.6347305389221557e0), (436, 0.48014440433212996e0), (437, 0.44545454545454544e0),
(438, 0.6104651162790697e0), (439, 0.5978260869565217e0), (440, 0.5308641975308642e0),
(441, 0.4151291512915129e0), (442, 0.4351648351648352e0), (443, 0.5071428571428571e0),
(444, 0.4439140811455847e0), (445, 0.48859934853420195e0), (446, 0.6363636363636364e0),
(447, 0.4297029702970297e0), (448, 0.48951048951048953e0), (449, 0.6101694915254238e0),
(450, 0.6549295774647887e0), (451, 0.6875e0), (452, 0.4776536312849162e0),
(453, 0.4373795761078998e0), (454, 0.5751633986928104e0), (455, 0.8983050847457628e0),
(456, 0.7017543859649122e0), (457, 0.5693069306930693e0), (458, 0.4984520123839009e0),
(459, 0.47074468085106386e0), (460, 0.5402298850574713e0), (461, 0.4731182795698925e0),
(462, 0.4984709480122324e0), (463, 0.4419551934826884e0), (464, 0.5637254901960784e0),
(465, 0.50625e0), (466, 0.45010615711252655e0), (467, 0.475e0),
(468, 0.5652173913043478e0), (469, 0.8421052631578947e0), (470, 0.5517241379310345e0),
(471, 0.4835820895522388e0), (472, 0.5528846153846154e0), (473, 0.515358361774744e0),
(474, 0.48314606741573035e0), (475, 0.8311688311688312e0), (476, 0.7738095238095238e0),
(477, 0.5827814569536424e0), (478, 0.496551724137931e0), (479, 0.4370179948586118e0),
(480, 0.45125348189415043e0), (481, 0.7176470588235294e0), (482, 0.6e0),
(483, 0.5428571428571428e0), (484, 0.5746606334841629e0), (485, 0.7054263565891473e0),
(486, 0.631578947368421e0), (487, 0.4984423676012461e0), (488, 0.5609756097560976e0),
(489, 0.47318611987381703e0), (490, 0.5239852398523985e0), (491, 0.47554347826086957e0),
(492, 0.8181818181818182e0), (493, 0.43655913978494626e0), (494, 0.5533980582524272e0),
(495, 0.453125e0), (496, 0.4223194748358862e0), (497, 0.6585365853658537e0),
(498, 0.4247422680412371e0), (499, 0.6024096385542169e0)"""

  def defs: Map[String, Q] = Map(

    // Bigram LM surprise: the corpus model (c12, c1) is trained and
    // every doc scored in one plan — n_bigrams, Σ ppm(p(w2|w1)), and
    // novel-bigram occurrences. Integer division keeps both engines
    // bit-identical (positive operands: Spark `div` truncation ==
    // DuckDB `//` floor). Bigram keys ride the native WordShingles
    // expression, which case-folds — the oracle tokenizes lower(text).
    "q100_bigram_surprise" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val model = LanguageModel.bigramCounts(docs, "text")
        val scored = LanguageModel.surprise(docs, model, "doc_id", "text")
        docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("surprise_ppm"), lit(0L)).as("surprise_ppm"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg,
        |         toks[i] AS w1
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks) - 1)) AS i
        |        FROM t WHERE len(toks) >= 2)),
        |c AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY 1),
        |h AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
        |d AS (SELECT doc_id, bg, w1, count(*) AS cd FROM bg GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT d.doc_id,
        |    CAST(sum(d.cd) AS BIGINT) AS n_bigrams,
        |    CAST(sum(d.cd * ((1000000 * c.c12) // h.c1)) AS BIGINT) AS surprise_ppm,
        |    CAST(sum(CASE WHEN d.cd = c.c12 THEN d.cd ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM d JOIN c ON d.bg = c.bg
        |         JOIN h ON d.w1 = h.w1
        |  GROUP BY 1)
        |SELECT t.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
        |  coalesce(sc.surprise_ppm, 0) AS surprise_ppm,
        |  coalesce(sc.n_novel, 0) AS n_novel
        |FROM t LEFT JOIN sc ON t.doc_id = sc.doc_id
        |ORDER BY t.doc_id""".stripMargin)),

    // Inverted index rollup: per token, df, total tf, and the head of
    // the tf-desc/doc-asc-sorted postings (the deterministic shard
    // order); the oracle re-derives the top posting with a window.
    "q101_inverted_index" -> Q(
      (s, dir) => {
        val tf = Search.termFrequencies(
          Tables.documents(s, dir), "doc_id", "text")
        Search.invertedIndex(tf, 5)
          .select(col("token"), col("df"), col("total_tf"),
            element_at(col("top_postings"), 1).getField("doc_id")
              .as("top_doc"),
            element_at(col("top_postings"), 1).getField("tf").as("top_tf"))
          .orderBy(col("token"))
      },
      Some(s"""WITH $tfCte,
        |idx AS (
        |  SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
        |  FROM tf GROUP BY 1),
        |top1 AS (
        |  SELECT token, doc_id AS top_doc, tf AS top_tf FROM (
        |    SELECT token, doc_id, tf,
        |      row_number() OVER (PARTITION BY token
        |                         ORDER BY tf DESC, doc_id ASC) AS rn
        |    FROM tf) WHERE rn = 1)
        |SELECT idx.token, idx.df, idx.total_tf, top1.top_doc, top1.top_tf
        |FROM idx JOIN top1 ON idx.token = top1.token
        |ORDER BY idx.token""".stripMargin)),

    // Conjunctive keyword search: docs containing ALL query terms,
    // integer tf-sum score, score-desc/doc-asc top-20 — fully
    // deterministic ranking under the hash gate.
    "q102_keyword_search" -> Q(
      (s, dir) => Search.searchAll(
        Search.termFrequencies(Tables.documents(s, dir), "doc_id", "text"),
        Seq("spark", "join"), 20),
      Some(s"""WITH $tfCte,
        |m AS (
        |  SELECT doc_id, count(*) AS nm, CAST(sum(tf) AS BIGINT) AS score
        |  FROM tf WHERE token IN ('spark', 'join') GROUP BY 1)
        |SELECT doc_id, score FROM m WHERE nm = 2
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // Cross-doc repeated-segment removal: 2-token segments seen in
    // more than 10 distinct docs are boilerplate; docs reassemble
    // from surviving segments in order. The oracle rebuilds
    // clean_text with an ordered string_agg.
    "q103_segment_dedup" -> Q(
      (s, dir) => Dedup.dropRepeatedSegments(
          Tables.documents(s, dir), "doc_id", "text",
          segTokens = 2, maxDocs = 10)
        .orderBy(col("doc_id")),
      Some(s"""WITH $toksCte,
        |sg AS (
        |  SELECT doc_id, i AS pos,
        |    array_to_string(toks[(i * 2 + 1):((i + 1) * 2)], ' ') AS seg
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(0,
        |            CAST(ceil(len(toks) / 2.0) AS INT) - 1)) AS i
        |        FROM t WHERE len(toks) > 0)),
        |c AS (SELECT seg, count(DISTINCT doc_id) AS n_docs FROM sg GROUP BY 1),
        |agg AS (
        |  SELECT sg.doc_id, count(*) AS n_segments,
        |    CAST(sum(CASE WHEN c.n_docs > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |    coalesce(string_agg(CASE WHEN c.n_docs <= 10 THEN sg.seg END,
        |                        ' ' ORDER BY sg.pos), '') AS clean_text
        |  FROM sg JOIN c ON sg.seg = c.seg
        |  GROUP BY sg.doc_id)
        |SELECT d.doc_id, coalesce(agg.n_segments, 0) AS n_segments,
        |  coalesce(agg.n_dropped, 0) AS n_dropped,
        |  coalesce(agg.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin)),

    // Bloom membership: the filter is built over the even customer
    // keys and probed with ALL keys — true members must read maybe
    // (no false negatives), and the odd keys' false positives are a
    // deterministic function of the md5 hash family that the oracle
    // reproduces bit-for-bit (63-bit words, both engines).
    "q104_bloom_filter" -> Q(
      (s, dir) => {
        val nBits = 63 * 256
        val keys = Tables.customer(s, dir)
          .filter(col("c_custkey") % 2 === 0)
          .select(concat(lit("c"), col("c_custkey")).as("k"))
        val bloom = Sketch.bloomBuild(keys, col("k"), nBits, 3)
        val probes = Tables.customer(s, dir)
          .select(col("c_custkey"), concat(lit("c"), col("c_custkey")).as("k"))
        Sketch.bloomMightContain(bloom, probes, col("k"), nBits, 3)
          .orderBy(col("c_custkey"))
      },
      Some("""WITH hs AS (SELECT unnest([0, 1, 2]) AS i),
        |pos AS (
        |  SELECT CAST(('0x' || substr(md5('c' || c_custkey || ':b' || i), 1, 15)) AS BIGINT) % 16128 AS p
        |  FROM customer CROSS JOIN hs WHERE c_custkey % 2 = 0),
        |bm AS (
        |  SELECT p // 63 AS word_idx,
        |         bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
        |  FROM pos GROUP BY 1),
        |pp AS (
        |  SELECT c_custkey, 'c' || c_custkey AS k,
        |         CAST(('0x' || substr(md5('c' || c_custkey || ':b' || i), 1, 15)) AS BIGINT) % 16128 AS p
        |  FROM customer CROSS JOIN hs)
        |SELECT c_custkey, k,
        |  bool_and((coalesce(bm.bits, 0) & (1::BIGINT << CAST(p % 63 AS INT)))
        |           = (1::BIGINT << CAST(p % 63 AS INT))) AS might_contain
        |FROM pp LEFT JOIN bm ON pp.p // 63 = bm.word_idx
        |GROUP BY 1, 2
        |ORDER BY c_custkey""".stripMargin)),

    // Two-pass heavy hitters at a collision-rich width (d=2, w=8 over
    // a ~31-token vocab): CMS candidates ≥900 include inflated
    // sub-threshold tokens, and the exact verification pass marks
    // them confirmed=false — the oracle reproduces the counter table
    // from the same fixed hash constants (q93's discipline) plus the
    // exact counts.
    "q106_heavy_hitters" -> Q(
      (s, dir) => Sketch.heavyHitters(
          Tables.documents(s, dir)
            .select(explode(graft.operators.TextAnalysis.tokens(
              lower(col("text")))).as("t")),
          col("t"), d = 2, w = 8, threshold = 900L)
        .orderBy(col("term")),
      {
        val P = Dedup.P
        def rowsSql(src: String, extra: String) = Dedup.perms(2).zipWithIndex
          .map { case ((a, b), i) =>
            s"SELECT $extra$i AS i, ((h * $a + $b) % $P) % 8 AS bucket FROM $src"
          }.mkString("\n|    UNION ALL ")
        Some(s"""WITH tok AS (
          |  SELECT unnest(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
          |                ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS t
          |  FROM documents),
          |h AS (SELECT t, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % $P AS h FROM tok),
          |ctr AS (
          |  SELECT i, bucket, count(*) AS cnt FROM (
          |    ${rowsSql("h", "")})
          |  GROUP BY i, bucket),
          |dh AS (SELECT t, h FROM (SELECT DISTINCT t FROM tok),
          |       LATERAL (SELECT CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % $P AS h)),
          |pb AS (
          |    ${rowsSql("dh", "t, ")}),
          |est AS (
          |  SELECT pb.t AS term, min(coalesce(ctr.cnt, 0)) AS cms_est
          |  FROM pb LEFT JOIN ctr ON pb.i = ctr.i AND pb.bucket = ctr.bucket
          |  GROUP BY pb.t),
          |ex AS (SELECT t AS term, count(*) AS exact_cnt FROM tok GROUP BY 1)
          |SELECT est.term, est.cms_est, ex.exact_cnt,
          |  ex.exact_cnt >= 900 AS confirmed
          |FROM est JOIN ex ON est.term = ex.term
          |WHERE est.cms_est >= 900
          |ORDER BY est.term""".stripMargin)
      }),

    // BPE merge training, 3 rounds over the corpus word vocabulary:
    // the oracle REPLAYS the full iteration — per-round pair counts,
    // the total-order argmax (count desc, left/right lexicographic),
    // and the double-space-delimited merge replace — as three chained
    // CTE stages, then compares the final symbolization of every
    // word. The same iterative-trainer gating as q84's k-means.
    "q107_bpe_train" -> Q(
      (s, dir) => {
        val vocab = Tables.documents(s, dir)
          .select(explode(graft.operators.TextAnalysis.tokens(
            lower(col("text")))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        val (words, _) = Bpe.train(vocab, "word", "cnt", rounds = 3)
        words.select(col("word"), col("cnt"), col("sym"))
          .orderBy(col("word"))
      },
      Some(s"""WITH $bpeHeadCte,
        |${bpeStage(1)},
        |${bpeStage(2)},
        |${bpeStage(3)}
        |SELECT word, cnt, sym FROM w3
        |ORDER BY word""".stripMargin)),

    // BPE-DROPOUT subword regularization (Provilkov 2020): the
    // 3-round trained merge chain re-applied with per-(word, merge)
    // salted-hash drops (p = 0.3), two salts — the BPE-family
    // companion to q466's unigram sampling, closing subword
    // regularization across both trained tokenizer families. The
    // oracle replays training AND both dropout chains (one CASE per
    // merge stage), so every sampled symbolization hash-gates.
    "q471_bpe_dropout" -> Q(
      (s, dir) => {
        val vocab = Tables.documents(s, dir)
          .select(explode(graft.operators.TextAnalysis.tokens(
            lower(col("text")))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        val (words, merges) = Bpe.train(vocab, "word", "cnt", rounds = 3)
        val base = words.select(col("word"),
          size(split(trim(col("sym")), "\\s+")).cast("long")
            .as("n_sub_best"))
        Seq("sA", "sB").map { salt =>
            Bpe.dropoutSymbolize(vocab, "word",
                merges.map(m => (m._1, m._2)), salt, dropPpm = 300000L)
              .withColumn("salt", lit(salt))
          }.reduce(_ unionByName _)
          .join(base, Seq("word"))
          .select(col("word"), col("cnt"), col("salt"),
            trim(col("sym_drop")).as("sym_drop"),
            size(split(trim(col("sym_drop")), "\\s+")).cast("long")
              .as("n_sub_drop"),
            col("n_sub_best"))
          .orderBy(col("word"), col("salt"))
      },
      {
        def dropStage(saltTag: String, n: Int): String = {
          val prev = s"d$saltTag${n - 1}"
          // merge index in the hash is 0-based (Spark zipWithIndex)
          val h = s"CAST(('0x' || substr(md5(w.word || ':${n - 1}:" +
            s"$saltTag'), 1, 15)) AS BIGINT) % 1000000"
          s"""d$saltTag$n AS (
             |  SELECT w.word, w.cnt,
             |    CASE WHEN b.l IS NULL THEN w.sd
             |         WHEN $h < 300000 THEN w.sd
             |         ELSE replace(w.sd, ' ' || b.l || '  ' || b.r || ' ',
             |                      ' ' || b.l || b.r || ' ') END AS sd
             |  FROM $prev w LEFT JOIN b$n b ON TRUE)""".stripMargin
        }
        def dropChain(saltTag: String): String =
          s"""d${saltTag}0 AS (SELECT word, cnt, sym AS sd FROM w0),
             |${(1 to 3).map(dropStage(saltTag, _)).mkString(",\n")}"""
            .stripMargin
        Some(s"""WITH $bpeHeadCte,
          |${bpeStage(1)},
          |${bpeStage(2)},
          |${bpeStage(3)},
          |${dropChain("sA")},
          |${dropChain("sB")},
          |u AS (
          |  SELECT word, cnt, 'sA' AS salt, sd FROM dsA3
          |  UNION ALL
          |  SELECT word, cnt, 'sB' AS salt, sd FROM dsB3)
          |SELECT u.word, u.cnt, u.salt, trim(u.sd) AS sym_drop,
          |  CAST(len(string_split_regex(trim(u.sd), '\\s+')) AS BIGINT)
          |    AS n_sub_drop,
          |  CAST(len(string_split_regex(trim(w3.sym), '\\s+')) AS BIGINT)
          |    AS n_sub_best
          |FROM u JOIN w3 ON w3.word = u.word
          |ORDER BY u.word, u.salt""".stripMargin)
      }),

    // URL canonicalization over generator-synthesized messy URLs
    // (upper-case scheme/host, www., default port, trailing slash,
    // utm_* tracking params, fragment). The oracle restates the
    // EXPECTED canonical form in closed form from the generator
    // arithmetic — it never runs the normalizer, so regex bugs can't
    // self-confirm.
    "q108_url_normalize" -> Q(
      (s, dir) => {
        val ck = col("c_custkey")
        val raw = concat(
          lit("HTTP://WWW.Site"), ck % 7, lit(".COM"),
          when(ck % 3 === 0, ":80").otherwise(""),
          lit("/Path/"), ck % 5,
          when(ck % 2 === 0, "/").otherwise(""),
          when(ck % 4 === 0, concat(lit("?utm_source=mail&id="), ck))
            .when(ck % 4 === 1, concat(lit("?id="), ck))
            .otherwise(lit("")),
          when(ck % 6 === 0, "#frag").otherwise(""))
        Tables.customer(s, dir)
          .select(ck, raw.as("url"))
          .select(ck, col("url"),
            Urls.normalize(col("url")).as("url_norm"),
            Urls.host(col("url")).as("host"))
          .orderBy(ck)
      },
      Some("""SELECT c_custkey,
        |  'HTTP://WWW.Site' || (c_custkey % 7) || '.COM' ||
        |    CASE WHEN c_custkey % 3 = 0 THEN ':80' ELSE '' END ||
        |    '/Path/' || (c_custkey % 5) ||
        |    CASE WHEN c_custkey % 2 = 0 THEN '/' ELSE '' END ||
        |    CASE WHEN c_custkey % 4 = 0 THEN '?utm_source=mail&id=' || c_custkey
        |         WHEN c_custkey % 4 = 1 THEN '?id=' || c_custkey
        |         ELSE '' END ||
        |    CASE WHEN c_custkey % 6 = 0 THEN '#frag' ELSE '' END AS url,
        |  'http://site' || (c_custkey % 7) || '.com/Path/' || (c_custkey % 5) ||
        |    CASE WHEN c_custkey % 4 IN (0, 1) THEN '?id=' || c_custkey
        |         ELSE '' END AS url_norm,
        |  'site' || (c_custkey % 7) || '.com' AS host
        |FROM customer
        |ORDER BY c_custkey""".stripMargin)),

    // Symmetric int8 quantization of every embedding, exploded to
    // (vec_id, pos, q, scale) so each quantized component is gated.
    // Both engines divide the SAME doubles (floats widen exactly) and
    // truncate toward zero — the oracle uses trunc(), never a
    // rounding CAST (DuckDB casts round half-even).
    "q109_quantize_int8" -> Q(
      (s, dir) => {
        val q = Similarity.quantizeInt8(col("embedding"))
        Tables.embeddings(s, dir)
          .select(col("vec_id"), q.getField("scale").as("scale"),
            posexplode(q.getField("q")).as(Seq("pos", "q")))
          .select(col("vec_id"), col("pos").cast("long").as("pos"),
            col("q"), col("scale"))
          .orderBy(col("vec_id"), col("pos"))
      },
      Some("""WITH e AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        |  FROM embeddings),
        |x AS (
        |  SELECT vec_id, embedding, maxabs,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM e)
        |SELECT vec_id, i - 1 AS pos,
        |  CASE WHEN maxabs = 0 THEN 0
        |       ELSE CAST(trunc(CAST(embedding[i] AS DOUBLE) / (maxabs / 127.0)) AS INT)
        |  END AS q,
        |  maxabs / 127.0 AS scale
        |FROM x
        |ORDER BY vec_id, pos""".stripMargin)),

    // BPE ENCODE (tokenizer inference): documents are encoded against
    // the 3-round trained vocabulary via a broadcast word→pieces
    // lookup — never by re-running merges per occurrence. The oracle
    // replays the identical training stages, then joins each doc's
    // tokens to the final symbolization and sums subword counts.
    "q110_bpe_encode" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val vocab = docs
          .select(explode(graft.operators.TextAnalysis.tokens(
            lower(col("text")))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        val (words, _) = Bpe.train(vocab, "word", "cnt", rounds = 3)
        val encoded = Bpe.encodeByVocab(docs, "doc_id", "text", words)
        docs.select(col("doc_id")).join(encoded, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_subwords"), lit(0L)).as("n_subwords"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $bpeHeadCte,
        |${bpeStage(1)},
        |${bpeStage(2)},
        |${bpeStage(3)},
        |t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
        |  FROM documents),
        |dt AS (SELECT doc_id, unnest(toks) AS word FROM t),
        |e AS (
        |  SELECT dt.doc_id, count(*) AS n_tokens,
        |    CAST(sum(coalesce(
        |      len(string_split_regex(trim(w3.sym), '\\s+')),
        |      length(dt.word))) AS BIGINT) AS n_subwords
        |  FROM dt LEFT JOIN w3 ON dt.word = w3.word
        |  GROUP BY 1)
        |SELECT t.doc_id, coalesce(e.n_tokens, 0) AS n_tokens,
        |  coalesce(e.n_subwords, 0) AS n_subwords
        |FROM t LEFT JOIN e ON t.doc_id = e.doc_id
        |ORDER BY t.doc_id""".stripMargin)),

    // Per-group HLL registers: one register table per document source
    // — the "approx distinct docs per dimension" sketch, still
    // integer-exact and oracle-reproducible.
    "q111_hll_by_source" -> Q(
      (s, dir) => Sketch.hllRegistersBy(
          Tables.documents(s, dir),
          col("source"), concat(lit("d"), col("doc_id")), 64)
        .orderBy(col("grp"), col("idx")),
      Some("""WITH k AS (
        |  SELECT source AS grp,
        |    CAST(('0x' || substr(md5('d' || doc_id), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |rk AS (
        |  SELECT grp, h % 64 AS idx,
        |    CASE WHEN (h >> 6) = 0 THEN 55
        |         ELSE 55 - length(bin(h >> 6)) END AS rank
        |  FROM k)
        |SELECT grp, idx, CAST(max(rank) AS INT) AS max_rank
        |FROM rk GROUP BY grp, idx
        |ORDER BY grp, idx""".stripMargin)),

    // Eval-set extraction: top-5 docs per source by quality score
    // (desc, doc_id tiebreak) — the curated-holdout step of a corpus
    // pipeline. Quality doubles are deterministic products of ratio
    // terms (the q41 discipline: raw doubles, never rounded), so the
    // cross-engine ordering and values hash-match.
    "q112_eval_extract" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(col("quality").desc, col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            graft.operators.TextAnalysis.qualityScore(col("text"))
              .as("quality"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("source"), col("rn").cast("long").as("rn"),
            col("doc_id"), col("quality"))
          .orderBy(col("source"), col("rn"))
      },
      {
        val tokensSql =
          """CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
            | ELSE string_split_regex(trim(lower(text)), '\s+') END""".stripMargin
        val sw = graft.operators.TextAnalysis.stopwordPattern(
          graft.operators.TextAnalysis.LangProfiles.en)
        val quality =
          s"""least(1.0, len($tokensSql) / 50.0)
             |    * (1.0 - least(1.0, len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) * 5.0))
             |    * least(1.0, len(regexp_extract_all(lower(text), '$sw')) / greatest(len($tokensSql), 1) * 10.0)""".stripMargin
        Some(s"""WITH q AS (
          |  SELECT doc_id, source, $quality AS quality
          |  FROM documents),
          |r AS (
          |  SELECT source, doc_id, quality,
          |    row_number() OVER (PARTITION BY source
          |                       ORDER BY quality DESC, doc_id) AS rn
          |  FROM q)
          |SELECT source, rn, doc_id, quality FROM r
          |WHERE rn <= 5
          |ORDER BY source, rn""".stripMargin)
      }),

    // Bloom-accelerated incremental ingestion: the ingested set is
    // the even customer keys, the incoming batch the %3 keys. Probes
    // reading definitely-absent skip the exact lookup; maybes verify
    // against the snapshot. might_contain (including deterministic
    // FPs) and the verified is_new both gate.
    "q113_bloom_ingest" -> Q(
      (s, dir) => {
        val nBits = 63 * 256
        val ingested = Tables.customer(s, dir)
          .filter(col("c_custkey") % 2 === 0)
          .select(concat(lit("c"), col("c_custkey")).as("k"))
        val incoming = Tables.customer(s, dir)
          .filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), concat(lit("c"), col("c_custkey")).as("k"))
        Sketch.bloomNewKeys(ingested, incoming, "k", nBits, 3)
          .select(col("c_custkey"), col("k"), col("might_contain"),
            col("is_new"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH hs AS (SELECT unnest([0, 1, 2]) AS i),
        |pos AS (
        |  SELECT CAST(('0x' || substr(md5('c' || c_custkey || ':b' || i), 1, 15)) AS BIGINT) % 16128 AS p
        |  FROM customer CROSS JOIN hs WHERE c_custkey % 2 = 0),
        |bm AS (
        |  SELECT p // 63 AS word_idx,
        |         bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
        |  FROM pos GROUP BY 1),
        |pp AS (
        |  SELECT c_custkey, 'c' || c_custkey AS k,
        |         CAST(('0x' || substr(md5('c' || c_custkey || ':b' || i), 1, 15)) AS BIGINT) % 16128 AS p
        |  FROM customer CROSS JOIN hs WHERE c_custkey % 3 = 0)
        |SELECT c_custkey, k,
        |  bool_and((coalesce(bm.bits, 0) & (1::BIGINT << CAST(p % 63 AS INT)))
        |           = (1::BIGINT << CAST(p % 63 AS INT))) AS might_contain,
        |  c_custkey % 2 = 1 AS is_new
        |FROM pp LEFT JOIN bm ON pp.p // 63 = bm.word_idx
        |GROUP BY 1, 2
        |ORDER BY c_custkey""".stripMargin)),

    // Sketch ALGEBRA: each sketch is built on two disjoint halves of
    // its stream and MERGED (CMS counters add, HLL registers max,
    // Bloom words OR); the oracle computes each sketch directly over
    // the whole stream — a green hash proves merge ≡ direct, the
    // property that lets sketches roll up across executors and days.
    "q115_sketch_merge" -> Q(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(graft.operators.TextAnalysis.tokens(
              lower(col("text")))).as("t"))
        def cmsHalf(p: Int) = Sketch.countMin(
          toks.filter(col("doc_id") % 2 === p).select(col("t")),
          col("t"), d = 4, w = 8)
        val cms = Sketch.mergeCountMin(cmsHalf(0), cmsHalf(1))
          .select(lit("cms").as("kind"), col("row").as("k1"),
            col("bucket").as("k2"), col("cnt").as("v"))
        val orders = Tables.orders(s, dir)
          .select(col("o_orderkey"),
            concat(lit("o"), col("o_orderkey")).as("k"))
        def hllHalf(p: Int) = Sketch.hllRegisters(
          orders.filter(col("o_orderkey") % 2 === p).select(col("k")),
          col("k"), 64)
        val hll = Sketch.mergeHll(hllHalf(0), hllHalf(1))
          .select(lit("hll").as("kind"), col("idx").as("k1"),
            lit(-1L).as("k2"), col("max_rank").cast("long").as("v"))
        val nBits = 63 * 256
        val cust = Tables.customer(s, dir)
          .filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey"),
            concat(lit("c"), col("c_custkey")).as("k"))
        def bloomHalf(p: Int) = Sketch.bloomBuild(
          cust.filter(col("c_custkey") % 4 === p).select(col("k")),
          col("k"), nBits, 3)
        val bloom = Sketch.mergeBloom(bloomHalf(0), bloomHalf(2))
          .select(lit("bloom").as("kind"), col("word_idx").as("k1"),
            lit(-1L).as("k2"), col("bits").as("v"))
        cms.unionByName(hll).unionByName(bloom)
          .orderBy(col("kind"), col("k1"), col("k2"))
      },
      {
        val P = Dedup.P
        val rows = Dedup.perms(4).zipWithIndex.map { case ((a, b), i) =>
          s"SELECT $i AS i, ((h * $a + $b) % $P) % 8 AS bucket FROM h"
        }.mkString("\n|    UNION ALL ")
        Some(s"""WITH tok AS (
          |  SELECT unnest(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
          |                ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS t
          |  FROM documents),
          |h AS (SELECT CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % $P AS h FROM tok),
          |ctr AS (
          |  SELECT i, bucket, count(*) AS cnt FROM (
          |    $rows)
          |  GROUP BY i, bucket),
          |ok AS (
          |  SELECT CAST(('0x' || substr(md5('o' || o_orderkey), 1, 15)) AS BIGINT) AS h2
          |  FROM orders),
          |rk AS (
          |  SELECT h2 % 64 AS idx,
          |    CASE WHEN (h2 >> 6) = 0 THEN 55
          |         ELSE 55 - length(bin(h2 >> 6)) END AS rank
          |  FROM ok),
          |hll AS (SELECT idx, max(rank) AS r FROM rk GROUP BY 1),
          |hs AS (SELECT unnest([0, 1, 2]) AS i),
          |pos AS (
          |  SELECT CAST(('0x' || substr(md5('c' || c_custkey || ':b' || i), 1, 15)) AS BIGINT) % 16128 AS p
          |  FROM customer CROSS JOIN hs WHERE c_custkey % 2 = 0),
          |bm AS (
          |  SELECT p // 63 AS w,
          |         bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
          |  FROM pos GROUP BY 1)
          |SELECT 'cms' AS kind, CAST(i AS BIGINT) AS k1, bucket AS k2,
          |       CAST(cnt AS BIGINT) AS v FROM ctr
          |UNION ALL
          |SELECT 'hll', idx, CAST(-1 AS BIGINT), CAST(r AS BIGINT) FROM hll
          |UNION ALL
          |SELECT 'bloom', w, CAST(-1 AS BIGINT), bits FROM bm
          |ORDER BY kind, k1, k2""".stripMargin)
      }),

    // Compression-ratio quality signal over every document. No
    // SQL-portable zlib exists, so for nine rounds this was the
    // suite's one rows-only gate; DeflateRatio is DETERMINISTIC
    // (fixed level-1 raw deflate over the seed-42 sf0.01 fixture),
    // so the oracle is a precomputed expected-values table (the q108
    // closed-form discipline, r13 ask 4): 500 (doc_id, ratio) rows
    // computed at AUTHORING time by an independent zlib path
    // (Python zlib.compressobj(1, DEFLATED, -15) — verified
    // bit-identical to java.util.zip.Deflater(BEST_SPEED, nowrap);
    // both bind the same zlib algorithm, and ratio = IEEE division
    // of the two exact byte counts). The VALUES are pinned to the
    // driver's sf0.01 correctness gate — at any other SF this oracle
    // does not apply (the behavioral contract across corpora stays
    // pinned in DeflateRatioSpec; q322 gates the SQL-portable base).
    "q120_compression_quality" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.operators.TextAnalysis.compressionRatio(col("text"))
            .as("comp_ratio"))
        .withColumn("is_repetitive", col("comp_ratio") < 0.35)
        .orderBy(col("doc_id")),
      Some(s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, comp_ratio,
        |  comp_ratio < 0.35 AS is_repetitive
        |FROM (VALUES
        |$q120ExpectedValues) t(doc_id, comp_ratio)
        |ORDER BY doc_id""".stripMargin)),

    // q120's companion: hash-gates everything about the compression-
    // quality signal that IS SQL-portable — the exact row universe
    // and ordering, DeflateRatio's denominator (UTF-8 byte length),
    // and a portable repetitiveness proxy (duplicate char-trigram
    // fraction in ppm, computed WITHOUT explode: one array projection
    // per row). Shrinks q120's unproven surface to the single
    // DeflateRatio column, which DeflateRatioSpec pins (incl.
    // codegen≡interpreted bit-identity).
    "q322_compression_quality_base" -> Q(
      (s, dir) => {
        val t = coalesce(col("text"), lit(""))
        val n = length(t)
        val grams = when(n >= 3,
            transform(sequence(lit(1), n - 2), i => substr(t, i, lit(3))))
          .otherwise(array().cast("array<string>"))
        // char-trigram explosion + array_distinct is CPU-dense and
        // the local source is one split — spread (guide §2.2)
        graft.operators.Spread.byKey(Tables.documents(s, dir), "doc_id")
          .select(col("doc_id"),
            octet_length(t).cast("long").as("raw_bytes"),
            grams.as("__g"))
          .select(col("doc_id"), col("raw_bytes"),
            size(col("__g")).cast("long").as("n_grams"),
            size(array_distinct(col("__g"))).cast("long").as("__d"))
          .withColumn("dup3_ppm",
            expr("(n_grams - __d) * 1000000L div greatest(n_grams, 1L)"))
          .drop("__d")
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (
        |  SELECT doc_id,
        |    CAST(strlen(coalesce(text, '')) AS BIGINT) AS raw_bytes,
        |    CASE WHEN length(coalesce(text, '')) >= 3
        |         THEN list_transform(range(1, length(text) - 1), i -> substr(text, i, 3))
        |         ELSE CAST([] AS VARCHAR[]) END AS l
        |  FROM documents)
        |SELECT doc_id, raw_bytes,
        |  CAST(len(l) AS BIGINT) AS n_grams,
        |  (CAST(len(l) AS BIGINT) - CAST(len(list_distinct(l)) AS BIGINT)) * 1000000
        |    // greatest(CAST(len(l) AS BIGINT), 1) AS dup3_ppm
        |FROM g ORDER BY doc_id""".stripMargin)),

    // HLL register table over the order keys: idx = low 6 hash bits,
    // rank = leading-zero count of the remaining 54 bits + 1, computed
    // via binary-string LENGTH in both engines (integer-exact — no
    // float log2). The harmonic-mean estimate over these registers is
    // spec-gated (SketchSpec) since it's a driver-side double readout.
    "q105_hll_registers" -> Q(
      (s, dir) => Sketch.hllRegisters(
          Tables.orders(s, dir)
            .select(concat(lit("o"), col("o_orderkey")).as("k")),
          col("k"), 64)
        .orderBy(col("idx")),
      Some("""WITH k AS (
        |  SELECT CAST(('0x' || substr(md5('o' || o_orderkey), 1, 15)) AS BIGINT) AS h
        |  FROM orders),
        |rk AS (
        |  SELECT h % 64 AS idx,
        |    CASE WHEN (h >> 6) = 0 THEN 55
        |         ELSE 55 - length(bin(h >> 6)) END AS rank
        |  FROM k)
        |SELECT idx, CAST(max(rank) AS INT) AS max_rank
        |FROM rk GROUP BY idx
        |ORDER BY idx""".stripMargin)),

    // Hybrid retrieval: keyword top-20 (conjunctive tf-sum) fused with
    // vector top-20 (cosine vs vec 0) by reciprocal-rank fusion.
    // Contributions ride as 1000000 div (60 + rank) ppm — positive
    // integer truncation, identical in Spark `div` and DuckDB `//` —
    // so the fused ranking hash-matches. vec_id and doc_id share the
    // id space (one embedding per document).
    "q125_hybrid_rrf" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tf = Search.termFrequencies(
          Tables.documents(s, dir), "doc_id", "text")
        val kw = Search.searchAll(tf, Seq("spark", "join"), 20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id"))))
          .select(col("doc_id"), col("rank"))
        val e = Tables.embeddings(s, dir)
        val q0 = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        // top-20 via orderBy+limit (distributed TakeOrdered), THEN the
        // rank window over the 20 survivors — never a corpus-wide
        // single-partition window
        val vec = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q0))
          .withColumn("cos",
            Similarity.cosineNative(col("qv"), col("embedding")))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("cos").desc, col("vec_id"))))
          .select(col("vec_id").as("doc_id"), col("rank"))
        Search.rrfFuse(Seq(kw, vec), 15)
          .orderBy(col("rrf_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH $tfCte,
        |m AS (
        |  SELECT doc_id, count(*) AS nm, CAST(sum(tf) AS BIGINT) AS score
        |  FROM tf WHERE token IN ('spark', 'join') GROUP BY 1),
        |kw AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM (SELECT doc_id, score FROM m WHERE nm = 2
        |        ORDER BY score DESC, doc_id LIMIT 20)),
        |e AS (SELECT vec_id, ${SimilarityQueries.vSql} AS v FROM embeddings),
        |q0 AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |sc AS (SELECT e.vec_id, ${SimilarityQueries.cosSql("qv", "v")} AS cos
        |       FROM e CROSS JOIN q0 WHERE e.vec_id <> 0),
        |vec AS (
        |  SELECT vec_id AS doc_id,
        |    row_number() OVER (ORDER BY cos DESC, vec_id) AS rank
        |  FROM (SELECT vec_id, cos FROM sc
        |        ORDER BY cos DESC, vec_id LIMIT 20)),
        |u AS (SELECT doc_id, 1000000 // (60 + rank) AS contrib FROM kw
        |      UNION ALL
        |      SELECT doc_id, 1000000 // (60 + rank) FROM vec)
        |SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS rrf_ppm,
        |  count(*) AS n_lists
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_ppm DESC, doc_id LIMIT 15""".stripMargin)),

    // Winnowing fingerprints (MOSS): per-doc k-gram hashes, min of
    // each w-window selected on the (hash, pos) total order, distinct
    // winners. The oracle replays shingling with positions, the same
    // lpad-hex window key, and the same window frame.
    "q127_winnow_fingerprints" -> Q(
      (s, dir) => Dedup.winnowFingerprints(
          Tables.documents(s, dir), "doc_id", "text", k = 3, w = 4)
        .orderBy(col("doc_id"), col("pos")),
      Some(s"""WITH $winnowSelCte
        |SELECT doc_id,
        |  CAST(('0x' || substr(wmin, 1, 15)) AS BIGINT) AS fp_hash,
        |  CAST(substr(wmin, 16, 10) AS INT) AS pos
        |FROM sel
        |ORDER BY doc_id, pos""".stripMargin)),

    // Exact per-source token-length quantiles (nearest-rank): the
    // corpus length profile curation reads before choosing chunk
    // sizes. Integer-deterministic given the (value, doc_id) total
    // sort key and the shared ceil(p·n) rank formula.
    "q128_length_quantiles" -> Q(
      (s, dir) => {
        import graft.operators.{Corpus, TextAnalysis}
        Corpus.exactQuantiles(
            Tables.documents(s, dir).select(col("doc_id"), col("source"),
              size(TextAnalysis.tokens(col("text"))).cast("long")
                .as("n_tokens")),
            "source", "n_tokens", "doc_id", Seq(0.5, 0.9, 0.99))
          .orderBy(col("source"))
      },
      Some(s"""WITH $toksCte,
        |l AS (SELECT t.doc_id, d.source, len(t.toks) AS n_tokens
        |      FROM t JOIN documents d ON t.doc_id = d.doc_id),
        |r AS (SELECT source, doc_id, n_tokens,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_tokens, doc_id) AS rnk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM l)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        |  max(CASE WHEN rnk = ceil(0.5 * n) THEN n_tokens END) AS q_50,
        |  max(CASE WHEN rnk = ceil(0.9 * n) THEN n_tokens END) AS q_90,
        |  max(CASE WHEN rnk = ceil(0.99 * n) THEN n_tokens END) AS q_99
        |FROM r GROUP BY source
        |ORDER BY source""".stripMargin)),

    // MOSS composition: near-dup CANDIDATE pairs = docs sharing >= 2
    // surviving winnow fingerprints (fingerprints in > 10 docs are
    // boilerplate and dropped — which also bounds the self-join).
    "q129_winnow_near_dup" -> Q(
      (s, dir) => Dedup.winnowNearDupCandidates(
          Tables.documents(s, dir), "doc_id", "text",
          k = 3, w = 4, maxDf = 10, minShared = 2)
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $winnowSelCte,
        |fpd AS (SELECT DISTINCT doc_id,
        |          CAST(('0x' || substr(wmin, 1, 15)) AS BIGINT) AS fp_hash
        |        FROM sel),
        |dfc AS (SELECT fp_hash, count(*) AS df FROM fpd GROUP BY 1),
        |kept AS (SELECT fpd.doc_id, fpd.fp_hash
        |         FROM fpd JOIN dfc USING (fp_hash) WHERE df <= 10),
        |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |       FROM kept a JOIN kept b USING (fp_hash)
        |       WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b, count(*) AS n_shared
        |FROM pr GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin)),

    // Exact-substring dedup signal (Lee et al. 2022) without a suffix
    // array: L-token shingle anchors shared by >= 2 docs, coalesced
    // into maximal per-doc duplicated spans. L=5 so the synthetic
    // corpus' repeated sentences surface as spans, not noise.
    "q133_dup_spans" -> Q(
      (s, dir) => Dedup.dupSpans(
          Tables.documents(s, dir), "doc_id", "text", spanTokens = 5)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |d AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
        |sh AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    CAST(('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))
        |      AS BIGINT) AS h
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 4)) AS i
        |        FROM toks WHERE len(t) >= 5)),
        |dfh AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
        |                       FROM sh GROUP BY h) WHERE nd >= 2),
        |dup AS (SELECT doc_id, pos FROM sh JOIN dfh USING (h)),
        |br AS (SELECT doc_id, pos,
        |    CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |                 + 5 THEN 1 ELSE 0 END AS brk
        |  FROM dup),
        |sp AS (SELECT doc_id, sid,
        |    CAST(max(pos) + 5 - min(pos) AS BIGINT) AS span_tokens
        |  FROM (SELECT doc_id, pos,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
        |        FROM br)
        |  GROUP BY doc_id, sid),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
        |    CAST(sum(span_tokens) AS BIGINT) AS dup_tokens,
        |    CAST(max(span_tokens) AS BIGINT) AS max_span_tokens
        |  FROM sp GROUP BY doc_id)
        |SELECT d.doc_id, d.n_tokens,
        |  COALESCE(pd.n_dup_spans, 0) AS n_dup_spans,
        |  COALESCE(pd.dup_tokens, 0) AS dup_tokens,
        |  COALESCE(pd.max_span_tokens, 0) AS max_span_tokens,
        |  CASE WHEN d.n_tokens > 0
        |       THEN (1000000 * COALESCE(pd.dup_tokens, 0)) // d.n_tokens
        |       ELSE 0 END AS dup_ppm
        |FROM d LEFT JOIN pd USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // Whole-corpus token-length quantiles WITHOUT a global sort: the
    // value-range bisection path (one partial-agg pass per bisection
    // round). Same nearest-rank definition as q128, one global row.
    "q134_quantiles_bisect" -> Q(
      (s, dir) => {
        import graft.operators.{Corpus, TextAnalysis}
        Corpus.quantilesBisect(
          Tables.documents(s, dir).select(
            size(TextAnalysis.tokens(col("text"))).as("n_tokens")),
          "n_tokens", Seq(0.5, 0.9, 0.99))
      },
      Some(s"""WITH $toksCte,
        |l AS (SELECT len(toks) AS n_tokens FROM t
        |      WHERE toks IS NOT NULL),
        |r AS (SELECT n_tokens,
        |    row_number() OVER (ORDER BY n_tokens) AS rnk,
        |    count(*) OVER () AS n
        |  FROM l)
        |SELECT CAST(max(n) AS BIGINT) AS n_rows,
        |  CAST(max(CASE WHEN rnk = ceil(0.5 * n) THEN n_tokens END)
        |    AS BIGINT) AS q_50,
        |  CAST(max(CASE WHEN rnk = ceil(0.9 * n) THEN n_tokens END)
        |    AS BIGINT) AS q_90,
        |  CAST(max(CASE WHEN rnk = ceil(0.99 * n) THEN n_tokens END)
        |    AS BIGINT) AS q_99
        |FROM r""".stripMargin)),

    // Interpolated trigram-LM scoring (Jelinek–Mercer with fixed
    // integer weights 5/3/2): the higher-order analog of q100's
    // bigram surprise — three vocabulary-bounded model tables, then a
    // distinct-trigram join per doc. Integer ppm end-to-end.
    "q135_trigram_interp" -> Q(
      (s, dir) => LanguageModel.trigramInterpolated(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH lt AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |u AS (SELECT w, count(*) AS cu
        |      FROM (SELECT unnest(t) AS w FROM lt) GROUP BY 1),
        |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_total FROM u),
        |bg AS (SELECT t[i] AS b1, t[i+1] AS b2, count(*) AS cb
        |       FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        |             FROM lt WHERE len(t) >= 2) GROUP BY 1, 2),
        |tg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
        |       FROM (SELECT doc_id, t,
        |               unnest(generate_series(1, len(t) - 2)) AS i
        |             FROM lt WHERE len(t) >= 3)),
        |c3 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg GROUP BY 1, 2, 3),
        |dt AS (SELECT doc_id, w1, w2, w3, count(*) AS cd
        |       FROM tg GROUP BY 1, 2, 3, 4),
        |sc AS (SELECT dt.doc_id, dt.cd,
        |    (5 * COALESCE((1000000 * c3.c123) // m12.cb, 0)
        |     + 3 * COALESCE((1000000 * m23.cb) // u2.cu, 0)
        |     + 2 * COALESCE((1000000 * u3.cu) // tot.n_total, 0)) // 10
        |      AS ppm
        |  FROM dt
        |  LEFT JOIN c3 USING (w1, w2, w3)
        |  LEFT JOIN bg m12 ON m12.b1 = dt.w1 AND m12.b2 = dt.w2
        |  LEFT JOIN bg m23 ON m23.b1 = dt.w2 AND m23.b2 = dt.w3
        |  LEFT JOIN u u2 ON u2.w = dt.w2
        |  LEFT JOIN u u3 ON u3.w = dt.w3
        |  CROSS JOIN tot),
        |pd AS (SELECT doc_id, CAST(sum(cd) AS BIGINT) AS n_trigrams,
        |    CAST(sum(cd * ppm) AS BIGINT) AS interp_ppm_sum,
        |    CAST(min(ppm) AS BIGINT) AS min_interp_ppm
        |  FROM sc GROUP BY 1)
        |SELECT d.doc_id, COALESCE(pd.n_trigrams, 0) AS n_trigrams,
        |  COALESCE(pd.interp_ppm_sum, 0) AS interp_ppm_sum,
        |  COALESCE(pd.min_interp_ppm, 0) AS min_interp_ppm
        |FROM documents d LEFT JOIN pd USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin))
  )

  /** The winnowing selection as CTE stages ending in
    * `sel(doc_id, wmin)` — shared by q127 and q129 so both replay the
    * identical shingle/hash/window construction (k=3, w=4).
    */
  private[queries] val winnowSelCte =
    """toks AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, i - 1 AS pos,
      |         array_to_string(t[i:i+2], ' ') AS gram
      |  FROM (SELECT doc_id, t,
      |          unnest(generate_series(1, len(t) - 2)) AS i
      |        FROM toks WHERE len(t) >= 3)
      |  UNION ALL
      |  SELECT doc_id, 0 AS pos, array_to_string(t, ' ') AS gram
      |  FROM toks WHERE len(t) < 3),
      |h AS (SELECT doc_id, pos,
      |        CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) AS h
      |      FROM sh),
      |keyed AS (
      |  SELECT doc_id, pos,
      |    lpad(to_hex(h), 15, '0') ||
      |      lpad(CAST(pos AS VARCHAR), 10, '0') AS key,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM h),
      |wm AS (
      |  SELECT doc_id, pos, n,
      |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
      |  FROM keyed),
      |sel AS (SELECT DISTINCT doc_id, wmin
      |        FROM wm WHERE pos <= greatest(0, n - 4))""".stripMargin
}
